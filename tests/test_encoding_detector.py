"""TestEncodingDetector port (src/test/org/apache/nutch/util/
TestEncodingDetector.java:28-93) — the four clue-walk scenarios verbatim,
plus the helper-function tables the walk depends on.

The reference's content is the UTF-8 bytes of "çñôöøДЛжҶ"; min.confidence
-1 disables autodetection (the shipped nutch-default.xml value), 50
enables it. The ICU4J detector slot is filled by the documented pure-
Python stand-in (content._detect_statistical)."""

from nutch_spark.functions.content import (
    EncodingDetector,
    parse_character_encoding,
    resolve_encoding_alias,
)

CONTENT = "çñôöøДЛжҶ".encode("utf-8")  # TestEncodingDetector.java:34
CONTENT_TYPE = "text/plain"


def test_no_clues_returns_default():
    # :45-60 — autodetection disabled, no header: default encoding
    detector = EncodingDetector(min_confidence=-1)
    detector.auto_detect_clues(CONTENT, CONTENT_TYPE, header_content_type=None)
    assert detector.guess_encoding("windows-1252").lower() == "windows-1252"


def test_header_clue_wins_without_autodetect():
    # :62-69 — Content-Type header charset=UTF-16 becomes the best clue
    detector = EncodingDetector(min_confidence=-1)
    detector.auto_detect_clues(
        CONTENT, CONTENT_TYPE, header_content_type="text/plain; charset=UTF-16")
    assert detector.guess_encoding("windows-1252").lower() == "utf-16"


def test_sniffed_clue_wins_when_no_header():
    # :71-78 — an explicitly added 'sniffed' clue beats the default
    detector = EncodingDetector(min_confidence=-1)
    detector.auto_detect_clues(CONTENT, CONTENT_TYPE, header_content_type=None)
    detector.add_clue("windows-1254", "sniffed")
    assert detector.guess_encoding("windows-1252").lower() == "windows-1254"


def test_autodetect_beats_header_and_sniffed():
    # :80-90 — min confidence 50: the detector's utf-8 clue meets the
    # threshold and outranks both the UTF-16 header and the utf-32 sniff
    detector = EncodingDetector(min_confidence=50)
    detector.auto_detect_clues(
        CONTENT, CONTENT_TYPE, header_content_type="text/plain; charset=UTF-16")
    detector.add_clue("utf-32", "sniffed")
    assert detector.guess_encoding("windows-1252").lower() == "utf-8"


def test_first_no_threshold_clue_wins():
    # guessEncoding:254 — bestClue is only taken while it is still the
    # default, so the FIRST no-threshold clue wins (header before sniff)
    detector = EncodingDetector(min_confidence=-1)
    detector.add_clue("utf-16", "header")
    detector.add_clue("windows-1254", "sniffed")
    assert detector.guess_encoding("windows-1252").lower() == "utf-16"


def test_autodetect_gates():
    # :164-168 — no statistical clues for non-detectable types or tiny data
    for ct, data in (("application/pdf", CONTENT), (CONTENT_TYPE, b"ab")):
        detector = EncodingDetector(min_confidence=50)
        detector.auto_detect_clues(data, ct, header_content_type=None)
        assert detector.guess_encoding("windows-1252") == "windows-1252"


def test_parse_character_encoding_table():
    # parseCharacterEncoding:290-307
    assert parse_character_encoding(None) is None
    assert parse_character_encoding("text/html") is None
    assert parse_character_encoding("text/html; charset=UTF-8") == "UTF-8"
    assert parse_character_encoding('text/html; charset="UTF-8"; x=y') == "UTF-8"
    assert parse_character_encoding("text/html; charset= utf-8 ") == "utf-8"


def test_resolve_encoding_alias_table():
    # resolveEncodingAlias:270-282 + the mislabel map :142-145
    assert resolve_encoding_alias("ISO-8859-1") == "windows-1252"
    assert resolve_encoding_alias("GBK") == "gb18030"
    assert resolve_encoding_alias("utf-8") == "utf-8"
    assert resolve_encoding_alias("no-such-charset") is None
    assert resolve_encoding_alias(None) is None
    assert resolve_encoding_alias("") is None
