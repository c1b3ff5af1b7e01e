"""add_shad / normalize_lit semantics (utils.php:777-818) + dedup keys."""

import pyarrow as pa

from rkts_migration_ray.functions import normalize

# inputs recorded as doc-tests at utils.php:795-802; expectations derived from
# the rule set at utils.php:777-793
SHAD_CASES = {
    "a ga": "a ga",        # final g → no shad
    "a sho": "a sho",      # ...sh(o) with s at -3 → no shad
    "a ki": "a ki",        # vowel-skip to k → no shad
    "a gu": "a gu/",       # u is NOT in the vowel-skip set → plain letter
    "a nga": "a nga /",    # final ng → ' /'
    "a ngu": "a ngu/",     # u not skipped → plain letter
    "a ngi": "a ngi /",    # i skipped → ng → ' /'
    "a tsho": "a tsho/",   # s..h but t at -4 blocks the exception
    "x": "x",              # too short
    "ab3": "ab3",          # non-letter final
}


def test_add_shad_scalar():
    for src, want in SHAD_CASES.items():
        assert normalize.add_shad(src) == want, src


def test_add_shad_vectorized_matches_scalar():
    extra = ["", "ka", "sangs rgyas", "tshul khrims", "phyin pa", None]
    arr = pa.array(list(SHAD_CASES) + extra, pa.string())
    got = normalize.add_shad_array(arr).to_pylist()
    for src, out in zip(arr.to_pylist(), got):
        if src is None:
            assert out is None
        else:
            assert out == normalize.add_shad(src), src


def test_title_dedup_key():
    # kernelxmltottl.php:209-214: lowercase, strip '-' and ' '
    a = normalize.title_dedup_key(pa.array(["Mdo-sde Snga ma", "mdo sde sngama"]))
    assert a.to_pylist() == ["mdosdesngama", "mdosdesngama"]


def test_normalize_title_policy():
    titles = pa.array(["nga", "deva title", "poppe"])
    langs = pa.array(["bo-x-ewts", "sa-Deva", "cmg-x-poppe-simpl"])
    out = normalize.normalize_title_array(titles, langs, "bdrc").to_pylist()
    assert out[0] == "nga /"          # ewts → shad applied
    assert out[1] is None and out[2] is None  # dropped langs (utils.php:812-813)
    # non-bdrc target: untouched
    out2 = normalize.normalize_title_array(titles, langs, "rkts").to_pylist()
    assert out2 == ["nga", "deva title", "poppe"]
