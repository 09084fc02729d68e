"""Snowball stemmer family dueled over the reference's OWN
TestSnowballVocabData.zip (voc.txt -> output.txt per language — the
exact data TestSnowballVocab.assertVocabulary reads). Every word of
every language must stem EXACTLY; the transpiled classes
(snowball_ext.py) execute on the ported string machine
(snowball_runtime.py)."""

import zipfile

import pytest

from lucene_solr_spark.functions.snowball_ext import SNOWBALL_CLASSES

ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/snowball/TestSnowballVocabData.zip")

# zip dir name -> class key (TestSnowballVocab.java's language list)
LANGS = {
    "danish": "danish", "dutch": "dutch", "english": "english",
    "finnish": "finnish", "french": "french", "german": "german",
    "german2": "german2", "hungarian": "hungarian",
    "italian": "italian", "kraaij_pohlmann": "kp",
    "lovins": "lovins", "norwegian": "norwegian", "porter": "porter",
    "portuguese": "portuguese", "romanian": "romanian",
    "russian": "russian", "spanish": "spanish", "swedish": "swedish",
    "turkish": "turkish",
}


def _available():
    with zipfile.ZipFile(ZIP) as z:
        dirs = {n.split("/")[0] for n in z.namelist() if "/" in n}
    return sorted(d for d in dirs if d in LANGS)


@pytest.mark.parametrize("lang", _available())
def test_full_reference_vocabulary(lang):
    cls = SNOWBALL_CLASSES[LANGS[lang]]
    with zipfile.ZipFile(ZIP) as z:
        voc = z.read(f"{lang}/voc.txt").decode("utf-8").splitlines()
        out = z.read(f"{lang}/output.txt").decode("utf-8").splitlines()
    assert len(voc) == len(out) and len(voc) > 1000
    st = cls()
    bad = []
    for w, e in zip(voc, out):
        st.set_current(w)
        st.stem()
        got = st.get_current()
        if got != e:
            bad.append((w, e, got))
    assert not bad, (
        f"{lang}: {len(bad)}/{len(voc)} mismatches, first 10: {bad[:10]}")
