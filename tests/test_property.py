"""Property-based tests (hypothesis) for the pure kernel layer."""

import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from rkts_migration_ray.functions import minting, normalize

ascii_text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                     max_size=40)


@settings(max_examples=200, deadline=None)
@given(st.lists(ascii_text, max_size=20))
def test_add_shad_vectorized_equals_scalar(xs):
    got = normalize.add_shad_array(pa.array(xs, pa.string())).to_pylist()
    assert got == [normalize.add_shad(x) for x in xs]


@settings(max_examples=200, deadline=None)
@given(ascii_text)
def test_add_shad_idempotent_prefix(s):
    # add_shad only ever appends '/' or ' /' — never mutates the input prefix
    out = normalize.add_shad(s)
    assert out.startswith(s)
    assert out[len(s):] in ("", "/", " /")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789abcdefghij", min_size=0, max_size=12))
@example("00000a")  # regression: %04d collapses '00000' to '0000'
def test_pad_id_roundtrip(s):
    out = minting.pad_id(s)
    # zero-padded numeric prefix + untouched suffix; strips to the original int.
    # The padded digit prefix of `out` is whatever precedes the (unchanged)
    # non-digit suffix — its length may be shorter than the input digit run
    # when the input had excess leading zeros ('00000a' -> '0000a').
    n = 0
    while n < len(s) and s[n].isdigit():
        n += 1
    suffix = s[n:]
    assert out.endswith(suffix)
    digit_prefix = out[: len(out) - len(suffix)]
    assert digit_prefix.isdigit() or digit_prefix == ""
    assert int(digit_prefix or 0) == int(s[:n] or 0)


@settings(max_examples=100, deadline=None)
@given(ascii_text, ascii_text)
def test_minting_is_injective_in_content(a, b):
    ma = minting.mint_hash6("local", a)
    mb = minting.mint_hash6("local", b)
    if a == b:
        assert ma == mb
    assert len(ma) == 6 and ma == ma.upper()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(ascii_text, ascii_text), max_size=10))
def test_mint_node_array_matches_scalar(pairs):
    local = pa.array([p[0] or "x" for p in pairs], pa.string())
    content = pa.array([p[1] for p in pairs], pa.string())
    got = minting.mint_node_array("TT", local, content).to_pylist()
    want = [minting.mint_node("TT", lo or "x", co) for (lo, co) in pairs]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(ascii_text, max_size=15))
def test_title_dedup_key_case_sep_insensitive(xs):
    keys = normalize.title_dedup_key(pa.array(xs, pa.string())).to_pylist()
    for x, k in zip(xs, keys):
        variant = x.upper().replace(" ", "-")
        k2 = normalize.title_dedup_key(pa.array([variant], pa.string()))[0].as_py()
        assert k2 == k


# ---------------------------------------------------------------------------
# Extractor robustness: arbitrary marker soup must never raise, and the
# per-turn list columns must keep their structural invariants. The fixture
# generator only emits well-formed markers; real transcripts will not.
# ---------------------------------------------------------------------------

_MARKERS = ["sec{", "chap{", "ttl[", "ttl[bo]{", "@[", "loc{", "locs{",
            "chl{", "chls{", "}", "]{", "]"]


@st.composite
def _marker_soup(draw):
    parts = draw(st.lists(
        st.one_of(st.sampled_from(_MARKERS), ascii_text), max_size=12))
    return " ".join(parts)


@settings(max_examples=150, deadline=None)
@given(st.lists(_marker_soup(), min_size=1, max_size=4))
def test_extract_features_total_on_marker_soup(texts):
    from rkts_migration_ray.stages.extract import extract_features

    n = len(texts)
    batch = pa.table({
        "conv_id": pa.array([f"c{i % 2}" for i in range(n)], pa.string()),
        "turn_idx": pa.array(list(range(n)), pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([""] * n, pa.string()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
    })
    out = extract_features(batch, include_chaploc=True)
    assert out.num_rows == n
    for c in ("mentions", "title_bcp", "title_label", "title_key",
              "chap_label"):
        col = out[c].to_pylist()
        assert len(col) == n
        assert all(isinstance(v, list) for v in col)
    # parallel title lists stay aligned
    for b, l, k in zip(out["title_bcp"].to_pylist(),
                       out["title_label"].to_pylist(),
                       out["title_key"].to_pylist()):
        assert len(b) == len(l) == len(k)


@settings(max_examples=150, deadline=None)
@given(ascii_text)
def test_loc_parsers_total_on_arbitrary_bodies(body):
    import pyarrow as pa

    from rkts_migration_ray.functions.locations import (
        parse_loc_full,
        parse_loc_simple,
    )

    arr = pa.array([body, None], pa.string())
    for parsed in (parse_loc_full(arr), parse_loc_simple(arr)):
        assert len(parsed["valid"]) == 2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=120), max_size=12))
def test_batch_shingle_hashes_equals_scalar(texts):
    """The batched DuckDB-md5 shingle kernel (round-5) is bit-identical to
    the per-doc hashlib path for arbitrary (incl. non-ASCII) text."""
    import numpy as np

    from rkts_migration_ray.functions import text as T

    batched = T.batch_shingle_hashes(texts)
    assert len(batched) == len(texts)
    for got, x in zip(batched, texts):
        want = T.shingle_hashes(T.tokens_lower(x))
        assert got.dtype == np.uint64
        assert set(map(int, got)) == set(map(int, want))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                         max_size=30), max_size=8))
def test_batch_minhash_signatures_equals_scalar(sh_lists):
    """batch_minhash_signatures row i == minhash_signature(sh_list[i]) for
    arbitrary uint64 shingle sets, empty docs included (M31 fill)."""
    import numpy as np

    from rkts_migration_ray.functions import text as T

    a, b = T.minhash_params(16)
    arrs = [np.array(s, dtype=np.uint64) for s in sh_lists]
    got = T.batch_minhash_signatures(arrs, a, b)
    for i, s in enumerate(arrs):
        assert np.array_equal(got[i], T.minhash_signature(s, a, b))
