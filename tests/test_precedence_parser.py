"""PrecedenceQueryParser gates (queryparser/flexible/precedence/):
the grammar pass wraps explicit-AND runs in grouping parens so the
classic parser builds the precedence tree — AND binds tighter than
OR, NOT binds to its following operand, existing parens recurse."""

from lucene_solr_spark.search.queryparser import (
    insert_precedence_groups,
    parse_query,
)


class TestRewrite:
    def test_and_tighter_than_or(self):
        assert insert_precedence_groups(
            "table AND window OR merge") == "(table AND window) merge"

    def test_juxtaposition_stays_default_or(self):
        assert insert_precedence_groups("a b AND c") == "a (b AND c)"

    def test_not_binds_to_operand(self):
        assert insert_precedence_groups(
            "a AND NOT b OR c") == "(a AND NOT b) c"
        assert insert_precedence_groups(
            "NOT a AND b") == "(NOT a AND b)"

    def test_nested_parens_recurse(self):
        assert insert_precedence_groups(
            "+x (a AND b OR c) d") == "+x ((a AND b) c) d"
        assert insert_precedence_groups(
            "a AND (b OR c) AND d") == "(a AND (b c) AND d)"

    def test_phrase_operand_kept_verbatim(self):
        assert insert_precedence_groups(
            '"one two" AND c OR d') == '("one two" AND c) d'

    def test_pure_or_and_single_unchanged(self):
        assert insert_precedence_groups("a OR b OR c") == "a b c"
        assert insert_precedence_groups("a") == "a"
        assert insert_precedence_groups("NOT a") == "NOT a"


class TestTreeSemantics:
    def test_precedence_tree_vs_classic(self):
        # classic: '+a +b c' flat (both AND-terms REQUIRED even with
        # the OR); precedence: SHOULD group (+a +b) + SHOULD c
        classic = parse_query("aa AND bb OR cc")
        assert [(c.occur, c.kind) for c in classic] == [
            ("must", "term"), ("must", "term"), ("should", "term")]
        prec = parse_query(insert_precedence_groups("aa AND bb OR cc"))
        assert [(c.occur, c.kind) for c in prec] == [
            ("should", "bool"), ("should", "term")]
        assert [(c.occur, c.kind) for c in prec[0].sub] == [
            ("must", "term"), ("must", "term")]
