"""Deterministic synthetic input tables (FIXTURES.md).

The driver's testdata has no transcripts table, so the engine synthesises its
primary input — a Parquet table of exactly the `input_hint` shape
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]) — plus the aux lookup tables mirroring the reference's CSVs:

- gazetteer     ≈ abstract-rkts.csv (utils.php:872-897; '?'-rows dropped)
- entity_props  ≈ rkts-actors.csv 'ab'/'ge' rows (utils.php:852-870)
- alias_map     ≈ KTMapping/SameTextDifferentTranslation/<now> redirects
                  (rkts.yaml:38-113, kernelxmltottl.php:255-270)

Everything is a pure function of (seed=42, sf tag): no wall-clock, no
randomness outside the seeded generator, byte-stable across processes — the
DuckDB oracles read the same files. Rows are written in shuffled order: the
engine must be permutation-invariant (the reference relies on document order,
editionxmltottl.php:432-435; we must not).

Text grammar (markers the extractor parses):
    sec{<name>}           section rollover marker (first turn of each section)
    ttl[<k>]{<title>}     title, k ∈ NAME_TO_BCP keys
    loc{<loc string>}     full location dialect   (utils.php:565 grammar)
    locs{<loc string>}    simple location dialect (utils.php:570 grammar)
    chap{<title>}         chapter title (editionxmltottl.php:219-245)
    chl{<loc string>}     chapter location, bampo/chap grammar (utils.php:566)
    chls{<b>-<e>}         chapter location, chemdo dialect (utils.php:572)
    cr[<tag>]{<name>}     creator, tag ∈ tag_to_event_role (editionxmltottl.php:5-19)
    @[<alias>]            entity mention (placeholders '-', '?', 'new' included)
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
FIXTURE_ROOT = "/tmp/graft_fixtures"
# bump when new tables are added; ensure_fixture regenerates stale dirs.
# Existing tables are bit-stable across versions: new tables draw from their
# OWN seeded generator streams, never the primary one. (v4: pagination.parquet
# gains '::'-less bad_file_ref rows — bvm tables only. v5: turn text gains
# chl{}/chls{} chapter-location markers. v6: turn text gains cr[tag]{name}
# creator markers. Text-bearing bumps keep the primary DRAWS unchanged but
# transcript text bytes differ.)
FIXTURE_VERSION = 6

N_TURNS_BY_TAG = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}

SECTION_POOL = [
    "'dul ba", "sher phyin", "dkon brtsegs", "phal chen", "mdo sde",
    "rgyud", "gzungs 'dus", "dbu ma", "tshad ma", "sems tsam",
]
VALID_VOLS = ["ka", "kha", "ga", "nga", "ca", "cha", "ja", "nya", "ta", "tha"]
INVALID_VOL = "qx"  # not in allowed_vol_letters → quarantine (utils.php:634-639)
TOOLS = ["search", "browse", "python", "sql", "fetch"]
HEADS = [f"head-{i:02d}" for i in range(5)]  # skewed head entities (≈ P7326)
PLACEHOLDERS = ["-", "?", "new"]
FILLER = (
    "the of and to in that it was for on are as with his they at be this from "
    "or had by word but what some we can out other were all there when up use "
    "your how said an each she which do their time if will way about many then"
).split()
TITLE_WORDS = (
    "mdo sde dkon mchog sprin gyi rgyud bka' 'gyur rin chen phung po las "
    "byang chub sems dpa' rnam par snang mdzad kyi zhus lan nga bshad sgrub "
    "thabs shes rab pha rol phyin pa sangs rgyas kyis gsungs tshul khrims"
).split()


def tag_of(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.01"


def n_turns_of(tag: str) -> int:
    if tag in N_TURNS_BY_TAG:
        return N_TURNS_BY_TAG[tag]
    try:
        return max(1000, int(6_000_000 * float(tag[2:])))
    except ValueError:
        return 60_000


def fixture_dir(sf_dir_or_tag: str) -> str:
    return os.path.join(FIXTURE_ROOT, tag_of(sf_dir_or_tag))


N_TRANSCRIPT_FILES = 16  # file-level read parallelism (a single file reads serially)


def transcripts_path(sf_dir_or_tag: str) -> str:
    """Directory of part files (read_parquet parallelizes per file)."""
    return os.path.join(fixture_dir(sf_dir_or_tag), "transcripts")


def transcripts_glob(sf_dir_or_tag: str) -> str:
    """DuckDB-readable glob for the same data."""
    return os.path.join(transcripts_path(sf_dir_or_tag), "*.parquet")


def aux_path(sf_dir_or_tag: str, name: str) -> str:
    return os.path.join(fixture_dir(sf_dir_or_tag), f"{name}.parquet")


def ensure_fixture(sf_dir_or_tag: str) -> str:
    """Idempotently generate the fixture set for a scale tier; returns its dir.

    Atomic: writes into a tmp dir then renames, so concurrent processes (the
    driver's oracle run vs the Ray run; bench at two CPU levels) are safe."""
    final = fixture_dir(sf_dir_or_tag)
    done_path = os.path.join(final, "_DONE")
    if os.path.exists(done_path):
        try:
            with open(done_path) as f:
                if json.load(f).get("version") == FIXTURE_VERSION:
                    return final
        except (json.JSONDecodeError, OSError):
            pass
        shutil.rmtree(final, ignore_errors=True)  # stale version: regenerate
    tag = tag_of(sf_dir_or_tag)
    tmp = final + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    meta = _generate(tag, tmp)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.exists(os.path.join(final, "_DONE")):  # lost the race: fine
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return final


def _generate(tag: str, out_dir: str) -> dict:
    n_target = n_turns_of(tag)
    rng = np.random.default_rng(SEED)

    # --- conversation lengths (skew: ~0.2% of convs are ~100x the median) ----
    est_convs = max(8, n_target // 13)
    lens = rng.integers(4, 24, size=est_convs)
    long_mask = rng.random(est_convs) < 0.002
    lens = np.where(long_mask, rng.integers(800, 1600, size=est_convs), lens)
    cum = np.cumsum(lens)
    n_conv = int(np.searchsorted(cum, n_target) + 1)
    lens = lens[:n_conv]
    n = int(lens.sum())

    conv_ord = np.repeat(np.arange(n_conv), lens)
    conv_id = np.array([f"conv-{i:06d}" for i in range(n_conv)], dtype=object)[conv_ord]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    turn_idx = (np.arange(n) - starts[conv_ord]).astype(np.int32)

    roles = rng.choice(["user", "assistant", "tool", "system"], size=n,
                       p=[0.42, 0.42, 0.10, 0.06])
    tool_pick = rng.choice(TOOLS, size=n)
    has_tool = (roles == "tool") | ((roles == "assistant") & (rng.random(n) < 0.25))
    tools = np.where(has_tool, tool_pick, "")

    base = 1_700_000_000_000_000
    conv_jitter = rng.integers(0, 1_000_000, size=n_conv)
    ts = (base + conv_ord.astype(np.int64) * 3_600_000_000
          + turn_idx.astype(np.int64) * (30_000_000 + conv_jitter[conv_ord]))

    # --- per-conv section plans (distinct names, ordered; ≈ ST8 rollover) ----
    simple_dialect = rng.random(n_conv) < 0.10
    sec_perms = [rng.permutation(len(SECTION_POOL)) for _ in range(n_conv)]
    # section ordinal of each turn: change section every ~6 turns
    sec_span = 6
    sec_ord_in_conv = np.minimum(turn_idx // sec_span, len(SECTION_POOL) - 1)
    is_sec_start = (turn_idx == 0) | (
        (sec_ord_in_conv > 0) & (turn_idx % sec_span == 0)
        & (sec_ord_in_conv != np.minimum((turn_idx - 1) // sec_span, len(SECTION_POOL) - 1))
    )
    sec_name = np.array(
        [SECTION_POOL[sec_perms[c][s]] for c, s in zip(conv_ord, sec_ord_in_conv)],
        dtype=object,
    )

    # --- marker draws ---------------------------------------------------------
    has_loc = rng.random(n) < 0.30
    loc_bad = rng.random(n) < 0.003          # unparsable → invalid_loc
    loc_badvol = rng.random(n) < 0.005       # bad volume letter → invalid_volname
    bvol_i = rng.integers(0, len(VALID_VOLS), size=n)
    evol_i = rng.integers(0, len(VALID_VOLS), size=n)
    bpage = rng.integers(1, 300, size=n)
    plen = rng.integers(1, 80, size=n)
    bline = rng.integers(1, 8, size=n)
    eline = rng.integers(1, 8, size=n)
    bside = rng.choice(["a", "b"], size=n)
    eside = rng.choice(["a", "b"], size=n)
    v1 = rng.integers(1, 100, size=n)
    vspan = rng.integers(0, 4, size=n)
    has_range = rng.random(n) < 0.6

    has_title = rng.random(n) < 0.15
    has_skt = has_title & (rng.random(n) < 0.30)
    has_deva = has_title & (rng.random(n) < 0.05)
    dup_title = has_title & (rng.random(n) < 0.25) & (turn_idx > 0)
    title_idx = rng.integers(0, len(TITLE_WORDS) - 4, size=(n, 2))
    title_len = rng.integers(2, 5, size=(n, 2))

    n_ment = rng.choice([0, 1, 2, 3], size=n, p=[0.45, 0.30, 0.15, 0.10])
    n_ent = max(200, n_target // 100)
    ment_kind = rng.random((n, 3))
    head_pick = rng.integers(0, len(HEADS), size=(n, 3))
    tail_pick = rng.integers(0, n_ent, size=(n, 3))
    ph_pick = rng.integers(0, len(PLACEHOLDERS), size=(n, 3))

    fill_idx = rng.integers(0, len(FILLER), size=(n, 6))

    # chapter markers (editionxmltottl.php:219-255 analog) — independent
    # stream so the primary draws (and all pre-v3 table bytes) are unchanged
    rng_ch = np.random.default_rng(SEED + 31)
    n_chap = rng_ch.choice([0, 1, 2], size=n, p=[0.90, 0.07, 0.03])
    ch_widx = rng_ch.integers(0, len(TITLE_WORDS) - 3, size=(n, 2))
    ch_len = rng_ch.integers(1, 4, size=(n, 2))
    ch_style = rng_ch.random((n, 2))

    # chapter locations (get_chap_loc utils.php:729-746; v5) — own stream so
    # the chapter draws above stay bit-identical. chemdo (simple-dialect)
    # conversations use the chls{N-N} dialect; others the bampo/chapter
    # grammar with occasional invalid bodies and out-of-whitelist letters.
    rng_chl = np.random.default_rng(SEED + 77)
    chl_bad = rng_chl.random((n, 2)) < 0.04
    chl_hasvol = rng_chl.random((n, 2)) < 0.65
    chl_badvol = rng_chl.random((n, 2)) < 0.06
    chl_vpick = rng_chl.integers(0, len(VALID_VOLS), size=(n, 2))
    chl_page = rng_chl.integers(1, 400, size=(n, 2))
    chl_side = rng_chl.choice(["a", "b"], size=(n, 2))
    chl_line = rng_chl.integers(1, 8, size=(n, 2))
    chl_hasrange = rng_chl.random((n, 2)) < 0.5
    chl_hasevol = rng_chl.random((n, 2)) < 0.4
    chl_evpick = rng_chl.integers(0, len(VALID_VOLS), size=(n, 2))
    chl_delta = rng_chl.integers(1, 20, size=(n, 2))

    # creators (tag_to_event_role, editionxmltottl.php:5-19; v6) — own
    # stream; ~8% of turns carry 1-2 cr[tag]{name} markers; the second
    # sometimes repeats the first name to exercise the AgentAsCreator
    # (event,label) collapse and event-node reuse
    from .stages.creators import TAG_TO_EVENT_ROLE

    cr_tags_pool = list(TAG_TO_EVENT_ROLE)
    rng_cr = np.random.default_rng(SEED + 101)
    n_cr = rng_cr.choice([0, 1, 2], size=n, p=[0.92, 0.06, 0.02])
    cr_tag = rng_cr.integers(0, len(cr_tags_pool), size=(n, 2))
    cr_widx = rng_cr.integers(0, len(TITLE_WORDS) - 2, size=(n, 2))
    cr_len = rng_cr.integers(1, 3, size=(n, 2))
    cr_dup = rng_cr.random(n) < 0.15

    # --- assemble text (one-time generation cost; cached as parquet) ---------
    texts = np.empty(n, dtype=object)
    first_title_of_conv: dict[int, str] = {}
    for i in range(n):
        parts = []
        if is_sec_start[i]:
            parts.append("sec{%s}" % sec_name[i])
        parts.extend(FILLER[j] for j in fill_idx[i, :3])
        if has_title[i]:
            c = conv_ord[i]
            if dup_title[i] and c in first_title_of_conv:
                t0 = first_title_of_conv[c]
                t = t0.replace(" ", "-").capitalize()  # case/sep variant → same dedup key
            else:
                w0, ln = title_idx[i, 0], title_len[i, 0]
                t = " ".join(TITLE_WORDS[w0:w0 + ln])
                first_title_of_conv.setdefault(c, t)
            parts.append("ttl[tib]{%s}" % t)
            if has_skt[i]:
                w1, ln1 = title_idx[i, 1], title_len[i, 1]
                parts.append("ttl[skt]{%s}" % " ".join(TITLE_WORDS[w1:w1 + ln1]))
            if has_deva[i]:
                parts.append("ttl[sktuni]{%s}" % TITLE_WORDS[title_idx[i, 1]])
        if has_loc[i]:
            if loc_bad[i]:
                parts.append("loc{%%bad%%}")
            elif simple_dialect[conv_ord[i]]:
                parts.append("locs{%d.%d?, - %d.%d}"
                             % (v1[i], bpage[i], v1[i] + vspan[i], bpage[i] + plen[i]))
            else:
                bv = INVALID_VOL if loc_badvol[i] else VALID_VOLS[bvol_i[i]]
                rng_part = ""
                if has_range[i]:
                    rng_part = "-%s %d%s%d" % (VALID_VOLS[evol_i[i]],
                                               bpage[i] + plen[i], eside[i], eline[i])
                parts.append("loc{%s, %s %d%s%d%s (vol. %d-%d)}"
                             % (sec_name[i], bv, bpage[i], bside[i], bline[i],
                                rng_part, v1[i], v1[i] + vspan[i]))
        for ci in range(n_chap[i]):
            w0, ln = ch_widx[i, ci], ch_len[i, ci]
            ctl = " ".join(TITLE_WORDS[w0:w0 + ln])
            r = ch_style[i, ci]
            if r < 0.5:
                ctl = f"{ci + 1}. {ctl}"        # dot < 5 → prefix stripped
            elif r < 0.6:
                ctl = f"chapter {ci + 1}. {ctl}"  # dot ≥ 5 → kept whole
            # else: no '. ' → PHP strpos-false quirk chops 2 leading chars
            parts.append("chap{%s}" % ctl)
            if simple_dialect[conv_ord[i]]:
                parts.append("chls{%d-%d}" % (chl_page[i, ci],
                                              chl_page[i, ci] + chl_delta[i, ci]))
            elif chl_bad[i, ci]:
                parts.append("chl{x??}")
            else:
                vol = ""
                if chl_hasvol[i, ci]:
                    vol = (INVALID_VOL if chl_badvol[i, ci]
                           else VALID_VOLS[chl_vpick[i, ci]]) + " "
                s = "%s%d%s%d" % (vol, chl_page[i, ci],
                                  chl_side[i, ci], chl_line[i, ci])
                if chl_hasrange[i, ci]:
                    ev = ((VALID_VOLS[chl_evpick[i, ci]] + " ")
                          if chl_hasevol[i, ci] else "")
                    s += "-%s%d%s%d" % (ev, chl_page[i, ci] + chl_delta[i, ci],
                                        chl_side[i, ci], chl_line[i, ci])
                parts.append("chl{%s}" % s)
        prev_nm = ""
        for mi in range(n_cr[i]):
            if mi == 1 and cr_dup[i]:
                nm = prev_nm
            else:
                w0, ln = cr_widx[i, mi], cr_len[i, mi]
                nm = " ".join(TITLE_WORDS[w0:w0 + ln])
            prev_nm = nm
            parts.append("cr[%s]{%s}" % (cr_tags_pool[cr_tag[i, mi]], nm))
        parts.extend(FILLER[j] for j in fill_idx[i, 3:])
        for m in range(n_ment[i]):
            r = ment_kind[i, m]
            if r < 0.03:
                alias = PLACEHOLDERS[ph_pick[i, m]]
            elif r < 0.38:
                alias = HEADS[head_pick[i, m]]
            else:
                alias = f"ent-{tail_pick[i, m]:05d}"
            parts.append("@[%s]" % alias)
        texts[i] = " ".join(parts)

    empty_text = rng.random(n) < 0.002  # edge rows: empty text (FIXTURES.md)
    texts[empty_text] = ""

    perm = rng.permutation(n)  # shuffled arrival order
    table = pa.table({
        "conv_id": pa.array(conv_id[perm], pa.string()),
        "turn_idx": pa.array(turn_idx[perm], pa.int32()),
        "role": pa.array(roles[perm], pa.string()),
        "text": pa.array(texts[perm], pa.string()),
        "tool": pa.array(tools[perm], pa.string()),
        "ts": pa.array(ts[perm], pa.timestamp("us")),
    })
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    step = (n + N_TRANSCRIPT_FILES - 1) // N_TRANSCRIPT_FILES
    for fi in range(N_TRANSCRIPT_FILES):
        sl = table.slice(fi * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(tdir, f"part-{fi:04d}.parquet"),
                           row_group_size=16 * 1024)

    # --- gazetteer (≈ abstract-rkts.csv; some '?' rows to be dropped) --------
    g_alias, g_canon = [], []
    for h_i, h in enumerate(HEADS):
        g_alias.append(h)
        g_canon.append(f"WA{900000 + h_i:06d}")
    n_gaz_tail = min(n_ent, max(160, n_ent * 7 // 10))
    gaz_tail = rng.choice(n_ent, size=n_gaz_tail, replace=False)
    qmark = rng.random(n_gaz_tail) < 0.10
    for j, e in enumerate(gaz_tail):
        g_alias.append(f"ent-{e:05d}")
        g_canon.append(f"WA??{e:04d}" if qmark[j] else f"WA{e:06d}")
    pq.write_table(pa.table({"alias": pa.array(g_alias, pa.string()),
                             "canonical_id": pa.array(g_canon, pa.string())}),
                   os.path.join(out_dir, "gazetteer.parquet"))

    # --- alias_map (redirect chains incl. a→b→c; heads targeted) -------------
    am_from, am_to, am_kind = [], [], []
    kinds = ["canon-merge", "same-translation", "redirect"]
    chain_src = rng.choice(n_ent, size=40, replace=False)
    for j in range(0, 40, 2):
        a, b = chain_src[j], chain_src[j + 1]
        am_from.append(f"WA{a:06d}"); am_to.append(f"WA{b:06d}")
        am_kind.append(kinds[j % 3])
        if j % 4 == 0:  # extend into a chain b→head-canonical
            am_from.append(f"WA{b:06d}"); am_to.append(f"WA{900000 + (j // 4) % 5:06d}")
            am_kind.append("redirect")
    pq.write_table(pa.table({"from_id": pa.array(am_from, pa.string()),
                             "to_id": pa.array(am_to, pa.string()),
                             "kind": pa.array(am_kind, pa.string())}),
                   os.path.join(out_dir, "alias_map.parquet"))

    # --- entity_props (≈ rkts-actors.csv; ~1% self-loops) --------------------
    p_ent, p_prop, p_obj = [], [], []
    all_canon = sorted({c for c in g_canon if "?" not in c}
                       | {t for t in am_to} | {f for f in am_from})
    for c in all_canon:
        k = int(rng.integers(1, 4))
        for _ in range(k):
            prop = "ab" if rng.random() < 0.55 else "ge"
            obj = c if rng.random() < 0.01 else f"P{int(rng.integers(0, 500)):05d}"
            p_ent.append(c); p_prop.append(prop); p_obj.append(obj)
    pq.write_table(pa.table({"entity_id": pa.array(p_ent, pa.string()),
                             "prop": pa.array(p_prop, pa.string()),
                             "object_id": pa.array(p_obj, pa.string())}),
                   os.path.join(out_dir, "entity_props.parquet"))

    n_pag, n_img = _generate_bvm(tag, out_dir)

    return {"tag": tag, "n_turns": int(n), "n_convs": int(n_conv),
            "n_gazetteer": len(g_alias), "n_alias_map": len(am_from),
            "n_entity_props": len(p_ent), "n_pagination": n_pag,
            "n_image_list": n_img, "seed": SEED, "version": FIXTURE_VERSION}


def _generate_bvm(tag: str, out_dir: str) -> tuple[int, int]:
    """Pagination records + image lists (≈ the rKTs pagination JSONs and
    il-cache image lists consumed by migrate-bvm.py). Anomalies are injected
    deterministically to exercise every reconciliation/validation branch:
    leading unused images (hidden+T0005 while i<3), mid-stream unused images
    (insertafter), trailing unused, 'missing' files (T0020), '(dN)' details
    (T0016), apostrophe duplicate folios, per-psection pagination restarts
    (order-violation noise, exactly like the reference's real data),
    invalid/duplicate tokens, wrong-imagegroup / reused / unknown file refs,
    '::'-less malformed refs (single-colon typo → bad_file_ref +
    dblcolidx=-1 fallthrough, migrate-bvm.py:268-271).

    Drawn from an independent generator stream so the primary tables stay
    bit-identical across fixture versions."""
    rng = np.random.default_rng(SEED + 1009)
    n_vols = max(8, n_turns_of(tag) // 1000)

    p_vol, p_idx, p_pg, p_ps, p_file = [], [], [], [], []
    i_vol, i_pos, i_fname = [], [], []

    for v in range(n_vols):
        simple = rng.random() < 0.08
        vol = (f"IGS{v:05d}" if simple else f"IG{v:05d}")
        folios = int(rng.integers(20, 50))
        n_ps = 1 if simple or rng.random() < 0.75 else int(rng.integers(2, 4))
        lead = int(rng.choice([0, 1, 2, 4], p=[0.55, 0.2, 0.15, 0.1]))
        img_num = 0
        fnames: list[str] = []

        def next_img():
            nonlocal img_num
            img_num += 1
            f = f"{vol}{img_num:04d}.jpg"
            fnames.append(f)
            return f

        for _ in range(lead):
            next_img()

        idx = 0
        prev_pg = None
        prev_fname = None
        did_wrong_group = rng.random() >= 0.10
        did_used_twice = rng.random() >= 0.10
        did_not_in_list = rng.random() >= 0.05
        per_ps = max(3, folios // n_ps)
        for ps_i in range(n_ps):
            ps = f"ps{ps_i + 1}" if n_ps > 1 else ""
            for f_no in range(1, per_ps + 1):
                dup_folio = (not simple) and rng.random() < 0.005
                sides = ["a", "b"] + (["'a", "'b"] if dup_folio else [])
                for side in sides:
                    idx += 1
                    if simple:
                        pg = "x?" if rng.random() < 0.01 else str(idx)
                    else:
                        pg = f"{f_no}{side}"
                        r = rng.random()
                        if r < 0.005:
                            pg = "??"          # invalid token
                        elif r < 0.010 and prev_pg is not None:
                            pg = prev_pg       # duplicate + order violation
                        elif r < 0.020:
                            pg = pg + "(d2)"   # detail → T0016
                        elif r < 0.040:
                            pg = pg + "?"      # uncertainty (no effect)
                    r2 = rng.random()
                    if r2 < 0.02:
                        file_val = "missing"   # → T0020
                    elif r2 < 0.03:
                        file_val = None        # no 'file' key
                    elif r2 < 0.035:
                        # '::'-less ref (single-colon typo) → bad_file_ref
                        # + the reference's dblcolidx=-1 fallthrough
                        file_val = f"bdr:{vol}:{vol}{idx:04d}.jpg"
                    elif not did_not_in_list and r2 < 0.05:
                        did_not_in_list = True
                        file_val = f"bdr:{vol}::{vol}9999.jpg"
                    elif not did_used_twice and r2 < 0.07 and prev_fname:
                        did_used_twice = True
                        file_val = f"bdr:{vol}::{prev_fname}"
                    else:
                        if rng.random() < 0.02:
                            next_img()         # unused image → insertafter
                        f = next_img()
                        if not did_wrong_group and r2 < 0.09:
                            did_wrong_group = True
                            file_val = f"bdr:IGX{v:05d}::{f}"
                        else:
                            file_val = f"bdr:{vol}::{f}"
                            prev_fname = f
                    p_vol.append(vol); p_idx.append(idx)
                    p_pg.append(pg); p_ps.append(ps); p_file.append(file_val)
                    prev_pg = pg
        for _ in range(int(rng.choice([0, 0, 0, 1, 2, 3]))):
            next_img()                         # trailing unused
        i_vol.extend([vol] * len(fnames))
        i_pos.extend(range(len(fnames)))
        i_fname.extend(fnames)

    pag_perm = rng.permutation(len(p_vol))
    img_perm = rng.permutation(len(i_vol))
    pq.write_table(pa.table({
        "vol_id": pa.array(np.asarray(p_vol, dtype=object)[pag_perm], pa.string()),
        "idx": pa.array(np.asarray(p_idx)[pag_perm], pa.int32()),
        "pagination": pa.array(np.asarray(p_pg, dtype=object)[pag_perm], pa.string()),
        "psection": pa.array(np.asarray(p_ps, dtype=object)[pag_perm], pa.string()),
        "file": pa.array(np.asarray(p_file, dtype=object)[pag_perm], pa.string()),
    }), os.path.join(out_dir, "pagination.parquet"))
    pq.write_table(pa.table({
        "vol_id": pa.array(np.asarray(i_vol, dtype=object)[img_perm], pa.string()),
        "pos": pa.array(np.asarray(i_pos)[img_perm], pa.int32()),
        "filename": pa.array(np.asarray(i_fname, dtype=object)[img_perm], pa.string()),
    }), os.path.join(out_dir, "image_list.parquet"))
    return len(p_vol), len(i_vol)
