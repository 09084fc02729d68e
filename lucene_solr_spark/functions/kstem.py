"""KStem (en/KStemmer.java — R. Krovetz, "Viewing Morphology as an
Inference Process", SIGIR'93; Java version by Sergio Guzman-Lara,
CIIR UMass): a dictionary-driven English stemmer — suffix heuristics
ordered plural -> pastTense -> aspect -> ity -> ness -> ion -> er/or
-> ly -> al -> ive -> ize -> ment -> ble -> ism -> ic -> ncy -> nce,
each candidate checked against the head-word lexicon
(kstem_data.WORDS + the exception/conflation/nationality/supplement/
proper-noun tables below), stopping at the FIRST dictionary hit.

Ported rule-for-rule: the j/k index discipline (j = final stem
letter, k = final word letter), endsIn side effects, the
recursive-consonant 'y' rule, wordInDict's matched-entry caching of
non-exception hits, the alEndings "// ERROR" lookup() the reference
ships, and the no-lookup default paths. Input contract: lowercase
a-z only (KStemFilter requires a preceding LowerCaseFilter); words
with other characters, length <= 2 or >= 50, or that are themselves
dictionary head words pass through unchanged.

Gated over the reference's own kstemTestData.zip vocabulary
(12k pairs) in tests/test_kstem.py."""

from __future__ import annotations

from lucene_solr_spark.functions.kstem_data import WORDS

MAX_WORD_LEN = 50

_EXCEPTION_WORDS = (
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane",
    "mare", "nape", "node", "pane", "pate", "plane", "pope",
    "programme", "quite", "ripe", "rote", "rune", "sage", "severe",
    "shoppe", "sine", "slime", "snipe", "steppe", "suite", "swinge",
    "tare", "tine", "tope", "tripe", "twine")

_DIRECT_CONFLATIONS = (
    ("aging", "age"), ("going", "go"), ("goes", "go"), ("lying", "lie"),
    ("using", "use"), ("owing", "owe"), ("suing", "sue"),
    ("dying", "die"), ("tying", "tie"), ("vying", "vie"),
    ("aged", "age"), ("used", "use"), ("vied", "vie"), ("cued", "cue"),
    ("died", "die"), ("eyed", "eye"), ("hued", "hue"), ("iced", "ice"),
    ("lied", "lie"), ("owed", "owe"), ("sued", "sue"), ("toed", "toe"),
    ("tied", "tie"), ("does", "do"), ("doing", "do"),
    ("aeronautical", "aeronautics"), ("mathematical", "mathematics"),
    ("political", "politics"), ("metaphysical", "metaphysics"),
    ("cylindrical", "cylinder"), ("nazism", "nazi"),
    ("ambiguity", "ambiguous"), ("barbarity", "barbarous"),
    ("credulity", "credulous"), ("generosity", "generous"),
    ("spontaneity", "spontaneous"), ("unanimity", "unanimous"),
    ("voracity", "voracious"), ("fled", "flee"),
    ("miscarriage", "miscarry"))

_COUNTRY_NATIONALITY = (
    ("afghan", "afghanistan"), ("african", "africa"),
    ("albanian", "albania"), ("algerian", "algeria"),
    ("american", "america"), ("andorran", "andorra"),
    ("angolan", "angola"), ("arabian", "arabia"),
    ("argentine", "argentina"), ("armenian", "armenia"),
    ("asian", "asia"), ("australian", "australia"),
    ("austrian", "austria"), ("azerbaijani", "azerbaijan"),
    ("azeri", "azerbaijan"), ("bangladeshi", "bangladesh"),
    ("belgian", "belgium"), ("bermudan", "bermuda"),
    ("bolivian", "bolivia"), ("bosnian", "bosnia"),
    ("botswanan", "botswana"), ("brazilian", "brazil"),
    ("british", "britain"), ("bulgarian", "bulgaria"),
    ("burmese", "burma"), ("californian", "california"),
    ("cambodian", "cambodia"), ("canadian", "canada"),
    ("chadian", "chad"), ("chilean", "chile"), ("chinese", "china"),
    ("colombian", "colombia"), ("croat", "croatia"),
    ("croatian", "croatia"), ("cuban", "cuba"), ("cypriot", "cyprus"),
    ("czechoslovakian", "czechoslovakia"), ("danish", "denmark"),
    ("egyptian", "egypt"), ("equadorian", "equador"),
    ("eritrean", "eritrea"), ("estonian", "estonia"),
    ("ethiopian", "ethiopia"), ("european", "europe"),
    ("fijian", "fiji"), ("filipino", "philippines"),
    ("finnish", "finland"), ("french", "france"),
    ("gambian", "gambia"), ("georgian", "georgia"),
    ("german", "germany"), ("ghanian", "ghana"), ("greek", "greece"),
    ("grenadan", "grenada"), ("guamian", "guam"),
    ("guatemalan", "guatemala"), ("guinean", "guinea"),
    ("guyanan", "guyana"), ("haitian", "haiti"),
    ("hawaiian", "hawaii"), ("holland", "dutch"),
    ("honduran", "honduras"), ("hungarian", "hungary"),
    ("icelandic", "iceland"), ("indonesian", "indonesia"),
    ("iranian", "iran"), ("iraqi", "iraq"), ("iraqui", "iraq"),
    ("irish", "ireland"), ("israeli", "israel"), ("italian", "italy"),
    ("jamaican", "jamaica"), ("japanese", "japan"),
    ("jordanian", "jordan"), ("kampuchean", "cambodia"),
    ("kenyan", "kenya"), ("korean", "korea"), ("kuwaiti", "kuwait"),
    ("lankan", "lanka"), ("laotian", "laos"), ("latvian", "latvia"),
    ("lebanese", "lebanon"), ("liberian", "liberia"),
    ("libyan", "libya"), ("lithuanian", "lithuania"),
    ("macedonian", "macedonia"), ("madagascan", "madagascar"),
    ("malaysian", "malaysia"), ("maltese", "malta"),
    ("mauritanian", "mauritania"), ("mexican", "mexico"),
    ("micronesian", "micronesia"), ("moldovan", "moldova"),
    ("monacan", "monaco"), ("mongolian", "mongolia"),
    ("montenegran", "montenegro"), ("moroccan", "morocco"),
    ("myanmar", "burma"), ("namibian", "namibia"),
    ("nepalese", "nepal"), ("nicaraguan", "nicaragua"),
    ("nigerian", "nigeria"), ("norwegian", "norway"),
    ("omani", "oman"), ("pakistani", "pakistan"),
    ("panamanian", "panama"), ("papuan", "papua"),
    ("paraguayan", "paraguay"), ("peruvian", "peru"),
    ("portuguese", "portugal"), ("romanian", "romania"),
    ("rumania", "romania"), ("rumanian", "romania"),
    ("russian", "russia"), ("rwandan", "rwanda"), ("samoan", "samoa"),
    ("scottish", "scotland"), ("serb", "serbia"),
    ("serbian", "serbia"), ("siam", "thailand"),
    ("siamese", "thailand"), ("slovakia", "slovak"),
    ("slovakian", "slovak"), ("slovenian", "slovenia"),
    ("somali", "somalia"), ("somalian", "somalia"),
    ("spanish", "spain"), ("swedish", "sweden"),
    ("swiss", "switzerland"), ("syrian", "syria"),
    ("taiwanese", "taiwan"), ("tanzanian", "tanzania"),
    ("texan", "texas"), ("thai", "thailand"), ("tunisian", "tunisia"),
    ("turkish", "turkey"), ("ugandan", "uganda"),
    ("ukrainian", "ukraine"), ("uruguayan", "uruguay"),
    ("uzbek", "uzbekistan"), ("venezuelan", "venezuela"),
    ("vietnamese", "viet"), ("virginian", "virginia"),
    ("yemeni", "yemen"), ("yugoslav", "yugoslavia"),
    ("yugoslavian", "yugoslavia"), ("zambian", "zambia"),
    ("zealander", "zealand"), ("zimbabwean", "zimbabwe"))

_SUPPLEMENT_DICT = (
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct",
    "backscatter", "connectionism")

_PROPER_NOUNS = (
    "abrams", "achilles", "acropolis", "adams", "agnes", "aires",
    "alexander", "alexis", "alfred", "algiers", "alps", "amadeus",
    "ames", "amos", "andes", "angeles", "annapolis", "antilles",
    "aquarius", "archimedes", "arkansas", "asher", "ashly", "athens",
    "atkins", "atlantis", "avis", "bahamas", "bangor", "barbados",
    "barger", "bering", "brahms", "brandeis", "brussels", "bruxelles",
    "cairns", "camoros", "camus", "carlos", "celts", "chalker",
    "charles", "cheops", "ching", "christmas", "cocos", "collins",
    "columbus", "confucius", "conners", "connolly", "copernicus",
    "cramer", "cyclops", "cygnus", "cyprus", "dallas", "damascus",
    "daniels", "davies", "davis", "decker", "denning", "dennis",
    "descartes", "dickens", "doris", "douglas", "downs", "dreyfus",
    "dukakis", "dulles", "dumfries", "ecclesiastes", "edwards",
    "emily", "erasmus", "euphrates", "evans", "everglades",
    "fairbanks", "federales", "fisher", "fitzsimmons", "fleming",
    "forbes", "fowler", "france", "francis", "goering", "goodling",
    "goths", "grenadines", "guiness", "hades", "harding", "harris",
    "hastings", "hawkes", "hawking", "hayes", "heights", "hercules",
    "himalayas", "hippocrates", "hobbs", "holmes", "honduras",
    "hopkins", "hughes", "humphreys", "illinois", "indianapolis",
    "inverness", "iris", "iroquois", "irving", "isaacs", "italy",
    "james", "jarvis", "jeffreys", "jesus", "jones", "josephus",
    "judas", "julius", "kansas", "keynes", "kipling", "kiwanis",
    "lansing", "laos", "leeds", "levis", "leviticus", "lewis",
    "louis", "maccabees", "madras", "maimonides", "maldive",
    "massachusetts", "matthews", "mauritius", "memphis", "mercedes",
    "midas", "mingus", "minneapolis", "mohammed", "moines", "morris",
    "moses", "myers", "myknos", "nablus", "nanjing", "nantes",
    "naples", "neal", "netherlands", "nevis", "nostradamus",
    "oedipus", "olympus", "orleans", "orly", "papas", "paris",
    "parker", "pauling", "peking", "pershing", "peter", "peters",
    "philippines", "phineas", "pisces", "pryor", "pythagoras",
    "queens", "rabelais", "ramses", "reynolds", "rhesus", "rhodes",
    "richards", "robins", "rodgers", "rogers", "rubens",
    "sagittarius", "seychelles", "socrates", "texas", "thames",
    "thomas", "tiberias", "tunis", "venus", "vilnius", "wales",
    "warner", "wilkins", "williams", "wyoming", "xmas", "yonkers",
    "zeus", "frances", "aarhus", "adonis", "andrews", "angus",
    "antares", "aquinas", "arcturus", "ares", "artemis", "augustus",
    "ayers", "barnabas", "barnes", "becker", "bejing", "biggs",
    "billings", "boeing", "boris", "borroughs", "briggs", "buenos",
    "calais", "caracas", "cassius", "cerberus", "ceres", "cervantes",
    "chantilly", "chartres", "chester", "connally", "conner", "coors",
    "cummings", "curtis", "daedalus", "dionysus", "dobbs", "dolores",
    "edmonds")


def _build_dict() -> dict:
    """initializeDictHash (:279-419): entry = (root_or_None,
    is_exception); insertion precedence preserved (a duplicate would
    have thrown in Java — the data has none)."""
    d: dict = {}
    for w in _EXCEPTION_WORDS:
        d[w] = (w, True)
    for w, root in _DIRECT_CONFLATIONS:
        d[w] = (root, False)
    for w, root in _COUNTRY_NATIONALITY:
        d[w] = (root, False)
    default = (None, False)
    for w in WORDS:
        d.setdefault(w, default)
    for w in _SUPPLEMENT_DICT:
        d.setdefault(w, default)
    for w in _PROPER_NOUNS:
        d.setdefault(w, default)
    return d


_DICT = _build_dict()

_VOWELS = frozenset("aeiou")


class _KStem:
    """One stem() invocation's state (word buffer + j/k indexes)."""

    __slots__ = ("w", "j", "k", "matched")

    def _is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _is_vowel(self, i: int) -> bool:
        return not self._is_cons(i)

    # -- endsIn family (sets j on match) --
    def _ends(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        r = len(self.w) - len(s)
        self.j = self.k
        if "".join(self.w[r:r + len(s)]) != s:
            return False
        self.j = r - 1
        return True

    def _set_len(self, n: int) -> None:
        del self.w[n:]

    def _write(self, ch: str) -> None:
        self.w.append(ch)

    def _append(self, s: str) -> None:
        self.w.extend(s)

    def _set_char(self, i: int, ch: str) -> None:
        # setCharAt may target one past the current end (the Java
        # OpenStringBuilder's reserved buffer); grow as needed
        if i == len(self.w):
            self.w.append(ch)
        else:
            self.w[i] = ch

    def _lookup(self) -> bool:
        e = _DICT.get("".join(self.w))
        self.matched = e
        return e is not None

    def _word_in_dict(self):
        if self.matched is not None:
            return self.matched
        e = _DICT.get("".join(self.w))
        if e is not None and not e[1]:
            self.matched = e
        return e

    def _double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.w[i] != self.w[i - 1]:
            return False
        return self._is_cons(i)

    def _vowel_in_stem(self) -> bool:
        return any(self._is_vowel(i) for i in range(self.j + 1))

    def _set_suffix(self, s: str) -> None:
        self._set_len(self.j + 1)
        self._append(s)
        self.k = self.j + len(s)

    # -- the ending routines (KStemmer.java:489-1360) --
    def _plural(self):
        if self.w[self.k] != "s":
            return
        if self._ends("ies"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            self._write("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends("es"):
            self._set_len(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (
                self.w[self.j] == "s" and self.w[self.j - 1] == "s")
            if try_e and self._lookup():
                return
            self._set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            self._write("e")
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if len(self.w) > 3 and self.w[self.k - 1] != "s" \
                    and not self._ends("ous"):
                self._set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self):
        if len(self.w) <= 4:
            return
        if self._ends("ied"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            self._write("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends("ed") and self._vowel_in_stem():
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self._write(self.w[self.k])
                self.k += 1
                self._lookup()
                return
            if self.w[0] == "u" and self.w[1] == "n":
                self._write("e")
                self._write("d")
                self.k += 2
                return
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            return

    def _aspect(self):
        if len(self.w) <= 5:
            return
        if self._ends("ing") and self._vowel_in_stem():
            self._set_char(self.j + 1, "e")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._set_len(self.k + 1)
                if self._lookup():
                    return
                self._write(self.w[self.k])
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) \
                    and self._is_cons(self.j - 1):
                self.k = self.j
                self._set_len(self.k + 1)
                return
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            return

    def _ity_endings(self):
        old_k = self.k
        if self._ends("ity"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_char(self.j + 1, "i")
            self._append("ty")
            self.k = old_k
            if self.j > 0 and self.w[self.j - 1] == "i" \
                    and self.w[self.j] == "l":
                self._set_len(self.j - 1)
                self._append("le")
                self.k = self.j
                self._lookup()
                return
            if self.j > 0 and self.w[self.j - 1] == "i" \
                    and self.w[self.j] == "v":
                self._set_len(self.j + 1)
                self._write("e")
                self.k = self.j + 1
                self._lookup()
                return
            if self.j > 0 and self.w[self.j - 1] == "a" \
                    and self.w[self.j] == "l":
                self._set_len(self.j + 1)
                self.k = self.j
                self._lookup()
                return
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            return

    def _nce_endings(self):
        old_k = self.k
        if self._ends("nce"):
            wc = self.w[self.j]
            if wc not in ("e", "a"):
                return
            self._set_len(self.j)
            self._write("e")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self._write(wc)
            self._append("nce")
            self.k = old_k

    def _ness_endings(self):
        if self._ends("ness"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self._set_char(self.j, "y")
            self._lookup()

    def _ism_endings(self):
        if self._ends("ism"):
            self._set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ment_endings(self):
        old_k = self.k
        if self._ends("ment"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._append("ment")
            self.k = old_k

    def _ize_endings(self):
        old_k = self.k
        if self._ends("ize"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("i")
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.w[self.j - 1])
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ize")
            self.k = old_k

    def _ncy_endings(self):
        if self._ends("ncy"):
            if self.w[self.j] not in ("e", "a"):
                return
            self._set_char(self.j + 2, "t")
            self._set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_char(self.j + 2, "c")
            self._write("e")
            self.k = self.j + 3
            self._lookup()

    def _ble_endings(self):
        old_k = self.k
        if self._ends("ble"):
            if self.w[self.j] not in ("a", "i"):
                return
            wc = self.w[self.j]
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                self._write(self.w[self.k - 1])
            self._set_len(self.j)
            self._write("e")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self._append("ate")
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j)
            self._write(wc)
            self._append("ble")
            self.k = old_k

    def _ic_endings(self):
        if self._ends("ic"):
            self._set_len(self.j + 3)
            self._append("al")
            self.k = self.j + 4
            if self._lookup():
                return
            self._set_char(self.j + 1, "y")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_char(self.j + 1, "e")
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._append("ic")
            self.k = self.j + 2

    def _ion_endings(self):
        old_k = self.k
        if not self._ends("ion"):
            return
        if self._ends("ization"):
            self._set_len(self.j + 3)
            self._write("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("ition"):
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ition")
            self.k = old_k
        elif self._ends("ation"):
            self._set_len(self.j + 3)
            self._write("e")
            self.k = self.j + 3
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ation")
            self.k = old_k
        if self._ends("ication"):
            self._set_len(self.j + 1)
            self._write("y")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ication")
            self.k = old_k
        # endsIn(ion) holds; just reset j (YCS)
        self.j = self.k - 3
        self._set_len(self.j + 1)
        self._write("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self._append("ion")
        self.k = old_k

    def _er_and_or_endings(self):
        old_k = self.k
        if self.w[self.k] != "r":
            return
        if self._ends("izer"):
            self._set_len(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("er") or self._ends("or"):
            wc = self.w[self.j + 1]
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.w[self.j - 1])
            if self.w[self.j] == "i":
                self._set_char(self.j, "y")
                self._set_len(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                self._set_char(self.j, "i")
                self._write("e")
            if self.w[self.j] == "e":
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write("e")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._write(wc)
            self._write("r")
            self.k = old_k

    def _ly_endings(self):
        old_k = self.k
        if self._ends("ly"):
            self._set_char(self.j + 2, "e")
            if self._lookup():
                return
            self._set_char(self.j + 2, "y")
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self.j > 0 and self.w[self.j - 1] == "a" \
                    and self.w[self.j] == "l":
                return
            self._append("ly")
            self.k = old_k
            if self.j > 0 and self.w[self.j - 1] == "a" \
                    and self.w[self.j] == "b":
                self._set_char(self.j + 2, "e")
                self.k = self.j + 2
                return
            if self.w[self.j] == "i":
                self._set_len(self.j)
                self._write("y")
                self.k = self.j
                if self._lookup():
                    return
                self._set_len(self.j)
                self._append("ily")
                self.k = old_k
            self._set_len(self.j + 1)
            self.k = self.j

    def _al_endings(self):
        old_k = self.k
        if len(self.w) < 4:
            return
        if self._ends("al"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.w[self.j - 1])
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("um")
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("al")
            self.k = old_k
            if self.j > 0 and self.w[self.j - 1] == "i" \
                    and self.w[self.j] == "c":
                self._set_len(self.j - 1)
                self.k = self.j - 2
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                self._write("y")
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                self._append("ic")
                self.k = self.j
                # the reference's "// ERROR" lookup() is kept
                self._lookup()
                return
            if self.w[self.j] == "i":
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append("ial")
                self.k = old_k
                self._lookup()

    def _ive_endings(self):
        old_k = self.k
        if self._ends("ive"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ive")
            if self.j > 0 and self.w[self.j - 1] == "a" \
                    and self.w[self.j] == "t":
                self._set_char(self.j - 1, "e")
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                if self._lookup():
                    return
                self._append("ative")
                self.k = old_k
            self._set_char(self.j + 2, "o")
            self._set_char(self.j + 3, "n")
            if self._lookup():
                return
            self._set_char(self.j + 2, "v")
            self._set_char(self.j + 3, "e")
            self.k = old_k


def kstem(term: str) -> str:
    """KStemmer.stem(String) (:1362-1366 + :1401-1513): unchanged for
    short/long/non-alpha input and for dictionary head words with no
    conflation root; otherwise the first-dictionary-hit heuristic
    walk."""
    k = len(term) - 1
    if k <= 1 or k >= MAX_WORD_LEN - 1:
        return term
    entry = _DICT.get(term)
    if entry is not None:
        return entry[0] if entry[0] is not None else term
    if not all("a" <= c <= "z" for c in term):
        return term

    st = _KStem()
    st.w = list(term)
    st.j = 0
    st.k = k
    st.matched = None

    # the reference's single-pass break chain (:1455-1492): note the
    # bare wordInDict() BETWEEN alEndings and iveEndings with no break
    # check of its own, and that nceEndings is last with no break
    while True:
        st._plural()
        if st.matched is not None:
            break
        st._past_tense()
        if st.matched is not None:
            break
        st._aspect()
        if st.matched is not None:
            break
        st._ity_endings()
        if st.matched is not None:
            break
        st._ness_endings()
        if st.matched is not None:
            break
        st._ion_endings()
        if st.matched is not None:
            break
        st._er_and_or_endings()
        if st.matched is not None:
            break
        st._ly_endings()
        if st.matched is not None:
            break
        st._al_endings()
        if st.matched is not None:
            break
        st._word_in_dict()
        st._ive_endings()
        if st.matched is not None:
            break
        st._ize_endings()
        if st.matched is not None:
            break
        st._ment_endings()
        if st.matched is not None:
            break
        st._ble_endings()
        if st.matched is not None:
            break
        st._ism_endings()
        if st.matched is not None:
            break
        st._ic_endings()
        if st.matched is not None:
            break
        st._ncy_endings()
        if st.matched is not None:
            break
        st._nce_endings()
        break

    entry = st.matched
    if entry is not None and entry[0] is not None:
        return entry[0]
    return "".join(st.w)


# memoized at the module name (pure function over a huge lexicon;
# pickled analyzer specs resolve this name, so the cache travels)
from functools import lru_cache as _lru_cache

kstem = _lru_cache(maxsize=1 << 17)(kstem)
