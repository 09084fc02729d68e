"""ASCIIFoldingFilter gates (lucene/analysis/common/.../miscellaneous/
ASCIIFoldingFilter.java): the embedded fold table is checked against a
60-case random sample of the reference switch's input->output relation
(mechanically extracted once; seeds the table's provenance), plus
well-known multi-char folds, pass-through, idempotence, and the
vectorized series path."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions.asciifold import (
    FOLD_MAP,
    ascii_folding_stream,
    fold,
    fold_series,
)

# (codepoint hex, folded output) — random sample of the reference's
# 1242-case switch (seed 42), spanning Latin-1, Latin Extended A/B,
# additions, phonetic extensions, fullwidth forms, and the
# parenthesized/circled numeral cases.
SAMPLE = [
    ("01AD", "t"), ("00EF", "i"), ("1E2F", "i"), ("1D88", "p"),
    ("1D10", "O"), ("01F5", "g"), ("0191", "F"), ("A75E", "V"),
    ("016F", "u"), ("FF3C", "\\"), ("247D", "(10)"), ("00FE", "th"),
    ("00FA", "u"), ("017C", "z"), ("1D06", "D"), ("1D6D", "d"),
    ("278B", "2"), ("FF54", "t"), ("00F2", "o"), ("FB06", "st"),
    ("027D", "r"), ("2478", "(5)"), ("1D0A", "J"), ("24B4", "(y)"),
    ("FF39", "Y"), ("1E35", "k"), ("00C8", "E"), ("021E", "H"),
    ("247E", "(11)"), ("1EB5", "a"), ("0216", "U"), ("02AF", "h"),
    ("1EAE", "A"), ("017A", "z"), ("201B", "'"), ("0183", "b"),
    ("1EDC", "O"), ("1EBD", "e"), ("FF58", "x"), ("1E19", "e"),
    ("0115", "e"), ("24C9", "T"), ("A74A", "O"), ("01D5", "U"),
    ("2018", "'"), ("015E", "S"), ("A77E", "G"), ("1E54", "P"),
    ("1EE1", "o"), ("FF21", "A"), ("0268", "i"), ("014B", "n"),
    ("011A", "E"), ("1D1C", "U"), ("1E4C", "O"), ("0160", "S"),
    ("018E", "E"), ("24BD", "H"), ("1EE8", "U"), ("0225", "z"),
]


class TestFold:
    @pytest.mark.parametrize("cp,want", SAMPLE)
    def test_reference_sample(self, cp, want):
        assert fold(chr(int(cp, 16))) == want

    def test_table_size(self):
        assert len(FOLD_MAP) == 1242  # the reference's full case list

    def test_multichar_folds(self):
        assert fold("Æ") == "AE" and fold("æ") == "ae"
        assert fold("Œ") == "OE" and fold("ß") == "ss"
        assert fold("Þ") == "TH" and fold("ﬁ") == "fi"

    def test_sentence(self):
        assert fold("Ærøskøbing — œuvre «déjà vu»") == \
            'AEroskobing - oeuvre "deja vu"'

    def test_ascii_passthrough(self):
        s = "The Quick [Brown] fox_99!"
        assert fold(s) == s

    def test_unmapped_passthrough(self):
        assert fold("中文 и кириллица") == "中文 и кириллица"

    def test_idempotent(self):
        folded = fold("Ĥéļłœ Ŵőřļđ")
        assert fold(folded) == folded

    def test_series_path_matches_scalar(self):
        vals = ["café", "naïve", "über", "plain", "Đặng ﬂambé"]
        got = fold_series(pd.Series(vals)).tolist()
        assert got == [fold(v) for v in vals]

    def test_stream_filter_keeps_positions(self):
        out = ascii_folding_stream([("café", 0), ("bar", 2)])
        assert out == [("cafe", 0), ("bar", 2)]


class TestRegisteredAnalyzer:
    def test_ascii_folding_chain_registered(self):
        from lucene_solr_spark.functions.analysis import get_analyzer

        spec = get_analyzer("ascii_folding")
        # standard chain (lowercase + stop) then fold
        assert spec.analyze("Café au LAIT and Ærø") == \
            ["cafe", "au", "lait", "aero"]
        assert not spec.emits_overlaps
