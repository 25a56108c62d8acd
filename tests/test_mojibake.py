"""Mojibake repair: kernel properties, chain-safety invariants, and the
Spark operator against the pure-Python kernel."""

import pytest

from supercrawler_spark.operators.mojibake import (
    GOOD_CHARS, MOJIBAKE_MAP, MOJIBAKE_SNIPPET, REPAIRED_SNIPPET,
    fix_mojibake, mojibake_image, repair_str,
)


def test_classic_sequences():
    assert repair_str("cafÃ©") == "café"
    assert repair_str("â€” dash â‚¬ euro â€¦ dots") == "— dash € euro … dots"
    assert repair_str("donâ€™t â€œquoteâ€\x9d me") == "don’t “quote” me"
    assert repair_str("SÃ£o Paulo, MÃ¼nchen, ZÃ¼rich") \
        == "São Paulo, München, Zürich"


def test_clean_text_untouched():
    for s in ("plain ascii", "already clean: café — “fine”", ""):
        assert repair_str(s) == s


def test_every_mapping_roundtrips():
    for c in GOOD_CHARS:
        img = mojibake_image(c)
        assert len(img) >= 2, (c, img)
        assert repair_str(img) == c, (c, img)


def test_double_encoding_peels_layers():
    # "é" twice-encoded: the inner image ("Ã©", good é = U+00E9) sorts
    # AFTER its outer components in chain order, so ONE pass cascades all
    # the way down
    img2 = mojibake_image("Ã") + mojibake_image("©")
    assert img2 == "ÃƒÂ©"
    assert repair_str(img2, passes=1) == "é"
    # "¡" twice-encoded: the inner image ("Â¡", good ¡ = U+00A1) sorts
    # BEFORE the outer Â entry, so pass 1 leaves one layer and pass 2
    # finishes — each pass peels AT LEAST one layer, order may peel more
    img2 = mojibake_image(mojibake_image("¡"))
    assert repair_str(img2, passes=1) == "Â¡"
    assert repair_str(img2, passes=2) == "¡"
    # extra passes are harmless (fixpoint short-circuit)
    assert repair_str(img2, passes=5) == "¡"


def test_chain_safety_invariants():
    bads = [b for b, _ in MOJIBAKE_MAP]
    # injective: no two good chars share an image
    assert len(set(bads)) == len(bads)
    # no image is a substring of another (application order cannot split
    # a pending match)
    for i, a in enumerate(bads):
        for j, b in enumerate(bads):
            if i != j:
                assert a not in b, (a, b)
    # the concatenated snippet repairs to exactly the concatenated goods
    # (no accidental cross-boundary matches)
    assert repair_str(MOJIBAKE_SNIPPET) == REPAIRED_SNIPPET


def test_spark_matches_kernel(spark):
    rows = [
        (0, "cafÃ© â€” rÃ©sumÃ©"),
        (1, "clean text stays"),
        (2, "mixed Ã¼ and already-good ü"),
        (3, MOJIBAKE_SNIPPET),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    for doc_id, text in rows:
        r = got[doc_id]
        assert r["fixed_text"] == repair_str(text)
        assert r["changed"] == (repair_str(text) != text)
        assert r["chars_saved"] == len(text) - len(repair_str(text))
    assert got[1]["n_suspect_before"] == 0
    assert got[0]["n_suspect_before"] == 4  # Ã© ×3 + â€ (of â€”)
    assert got[3]["n_suspect_before"] >= len(MOJIBAKE_MAP)


def test_corrupt_then_repair_roundtrip_property():
    """repair ∘ corrupt == identity on image-free text. The image-free
    assumption is fundamental: 'Ã¡' is byte-identical to the single
    encoding of 'á', so no repairer can fix the latter and preserve the
    former (hypothesis found exactly that counterexample)."""
    from hypothesis import assume, given, settings, strategies as st
    from supercrawler_spark.operators.mojibake import corrupt_str

    alphabet = st.sampled_from(
        list("abc XYZ 019 .,!?'\"<>&-_/\n\t") + list(GOOD_CHARS))

    @given(st.text(alphabet=alphabet, max_size=120))
    @settings(max_examples=300, deadline=None)
    def prop(s):
        assume(all(bad not in s for bad, _ in MOJIBAKE_MAP))
        assert repair_str(corrupt_str(s)) == s

    prop()


def test_ambiguous_text_repairs_to_plausible_reading():
    """The documented behavior on already-mojibake-looking text: it is
    read as mojibake and repaired one layer deeper."""
    from supercrawler_spark.operators.mojibake import corrupt_str
    assert repair_str(corrupt_str("Ã¡")) == "á"


def test_corrupt_str_is_the_real_double_decode():
    """corrupt_str must equal encode('utf-8') -> decode(sloppy cp1252) —
    the actual failure being modeled, byte for byte."""
    from supercrawler_spark.operators.mojibake import _sloppy_cp1252, corrupt_str
    for s in ("café — “fine” €9.99", "São ¡hola! Œuvre ˜", "ascii only"):
        real = "".join(_sloppy_cp1252(b) for b in s.encode("utf-8"))
        assert corrupt_str(s) == real
