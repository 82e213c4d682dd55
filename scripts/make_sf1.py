#!/usr/bin/env python3
"""Dev tool: build a ~sf1 dataset (10x sf0.1) under the repo for scale
cross-checks, preserving every physical type (incl. TIMESTAMP_NS on
events.ts, which Spark cannot write back).

Scaling strategy:
- events, lineitem, orders: 10 replicas with key offsets. The event_id
  offset is a multiple of lcm(500, 300, 100) * 137 so every marker-derived
  surrogate stream (DDL %500, task %300, position saves %100, op messages
  %137) keeps uniform density; the user_id offset is a multiple of 12 so
  channel (%4) and collection (%3) hashing is preserved. Order keys offset
  jointly in orders+lineitem so the join structure replicates.
- documents: 10 near-dup replicas with CONTROLLED mutation — each replica
  deterministically replaces ~10% of tokens with replica-unique tokens.
  Token survival 0.9 -> 3-gram survival 0.9^3 ~= 0.73, so original<->replica
  gram Jaccard ~= 0.73/1.27 ~= 0.57 (above the tau=0.5 LSH knee: an edge)
  while replica<->replica ~= 0.73^2/(2-0.73^2) ~= 0.36 (below it: no edge).
  Near-dup clusters are exactly the 10-doc replica groups with the original
  as hub (diameter 2) — bounded, not degenerate 10-cliques of identical
  text, so the dedup trio and contamination get a real 10x scale point.
- dimension-ish tables (customer, supplier, part, nation, region,
  embeddings) are copied as-is: replicated embeddings would create exact
  duplicate vectors and degenerate the vector suites' top-k structure.

Extra modes (4th arg):
- `events`: write ONLY a factor-x events table (streamed one replica at a
  time, so factor=100 never concatenates in RAM) — the CDC/stream-suite
  scale point; documents/embeddings stay at whatever the 10x dir holds.
- `skew`: write ONLY a zipf-hot events table the same size as src —
  SKEW_PCT% of all events collapse onto one hot PK per channel
  (deterministic by event_id), the hot-PK change-stream shape a uniform
  synthetic corpus never exercises. Channel hash (%4) is preserved, so
  per-channel ops see one ~SKEW_PCT/4 hot key each.
- `documents`: write ONLY a factor-x documents table (streamed one
  replica at a time) with BOUNDED near-dup structure: factor/10
  vocabulary-disjoint groups x 10 near-dup replicas, so the pair count
  grows linearly with the factor (real-corpus shape) instead of
  quadratically-sized dup clusters. The text/dedup-suite scale point;
  embeddings copied alongside for dedup_semantic.
- `embeddings`: write ONLY a factor-x embeddings table (streamed one
  replica at a time) — the vector-suite scale point. Replica 0 is the
  original, so the deterministic seed structure (IVF centroids = vec_id
  < 16, batched-query sets = vec_id < 8) is preserved; replica i > 0
  offsets vec_id and adds a small deterministic per-(vec, replica, dim)
  perturbation (~2% component scale, integer-hash PRN) so replicas are
  near the original in cosine but never exact duplicates — top-k
  structure stays non-degenerate while cluster geometry (and therefore
  IVF assignment balance) is preserved.

Usage: python3 scripts/make_sf1.py [src_dir] [dst_dir] [factor] [mode]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1")
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
MODE = sys.argv[4] if len(sys.argv) > 4 else "full"

COPY = ["customer", "supplier", "part", "nation", "region", "embeddings"]

MUTATE_PCT = 10  # % of tokens replaced per replica (see module docstring)


def round_up(n, mult):
    return ((n + mult - 1) // mult) * mult


def replicate(table, offsets):
    """offsets: {column: per-replica offset}. Replica 0 is the original."""
    parts = [table]
    for i in range(1, FACTOR):
        cols = []
        for name in table.column_names:
            col = table.column(name)
            if name in offsets:
                col = pc.add(col, pa.scalar(offsets[name] * i, type=col.type))
            cols.append(col)
        parts.append(pa.table(cols, names=table.column_names))
    return pa.concat_tables(parts)


def mutated_documents(docs):
    """FACTOR near-dup replicas of each doc: replica i > 0 replaces token p
    of doc d iff a deterministic hash of (d, i, p) falls under MUTATE_PCT,
    with a replica-unique token (never shared across replicas, so replica
    overlap comes only from jointly-surviving originals)."""
    docs = docs.replace_schema_metadata(None)  # concat needs equal schemas
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    d_off = round_up(max(doc_ids) + 1, 1000)
    parts = [docs]
    for i in range(1, FACTOR):
        new_ids, new_texts, new_nchars = [], [], []
        for did, text in zip(doc_ids, texts):
            toks = text.split(" ")
            out = [
                f"m{i}p{p}" if (did * 97 + i * 131 + p * 2654435761) % 100 < MUTATE_PCT
                else tok
                for p, tok in enumerate(toks)
            ]
            t = " ".join(out)
            new_ids.append(did + d_off * i)
            new_texts.append(t)
            new_nchars.append(len(t))
        parts.append(pa.table(
            [pa.array(new_ids, type=pa.int64()), pa.array(new_texts),
             pa.array(langs), pa.array(sources),
             pa.array(new_nchars, type=pa.int64())],
            names=["doc_id", "text", "lang", "source", "n_chars"]))
    return pa.concat_tables(parts)


NEAR_REPLICAS = 10  # near-dup group size, held FIXED at every factor


def write_documents_only(docs):
    """factor-x documents with BOUNDED near-dup structure: factor = G
    vocabulary-disjoint groups x NEAR_REPLICAS near-dup replicas. Group
    g > 0 prefixes every token with a group tag (token identity preserved
    WITHIN the group, zero gram overlap ACROSS groups); within each group,
    replica i > 0 applies the same MUTATE_PCT token mutation as the `full`
    mode. So the near-dup pair set per group matches the 10x corpus and
    the corpus-wide pair count grows LINEARLY with the factor — the shape
    of a real larger corpus (more dup groups), not factor-sized clusters
    whose pair output would grow quadratically and measure nothing.
    Streamed one (group, replica) at a time: factor=100 costs one
    source-sized table of RAM."""
    assert FACTOR % NEAR_REPLICAS == 0 and FACTOR >= NEAR_REPLICAS, \
        f"documents factor must be a multiple of {NEAR_REPLICAS}"
    groups = FACTOR // NEAR_REPLICAS
    docs = docs.replace_schema_metadata(None)
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    d_off = round_up(max(doc_ids) + 1, 1000)
    with pq.ParquetWriter(DST / "documents.parquet", docs.schema) as w:
        for g in range(groups):
            for i in range(NEAR_REPLICAS):
                if g == 0 and i == 0:
                    w.write_table(docs)
                    continue
                rep = g * NEAR_REPLICAS + i
                new_ids, new_texts, new_nchars = [], [], []
                for did, text in zip(doc_ids, texts):
                    toks = text.split(" ")
                    # Delimited tags ("g{g}_"): the undelimited form was
                    # prefix-ambiguous for g >= 10 (g=1 + token "1x" ==
                    # g=11 + token "x"), silently breaking cross-group
                    # vocabulary disjointness above FACTOR=100.
                    out = [
                        f"g{g}_m{i}p{p}"
                        if (did * 97 + i * 131 + p * 2654435761) % 100 < MUTATE_PCT
                        and i > 0
                        else (tok if g == 0 else f"g{g}_{tok}")
                        for p, tok in enumerate(toks)
                    ]
                    t = " ".join(out)
                    new_ids.append(did + d_off * rep)
                    new_texts.append(t)
                    new_nchars.append(len(t))
                w.write_table(pa.table(
                    [pa.array(new_ids, type=pa.int64()), pa.array(new_texts),
                     pa.array(langs), pa.array(sources),
                     pa.array(new_nchars, type=pa.int64())],
                    names=["doc_id", "text", "lang", "source", "n_chars"]))
    print(f"wrote {DST}/documents.parquet x{FACTOR} "
          f"({groups} vocab-disjoint groups x {NEAR_REPLICAS} near-dup "
          f"replicas, {MUTATE_PCT}% mutation, d_off={d_off})")


def events_offsets(ev):
    """Per-replica offsets preserving every marker/hash surrogate (see
    module docstring): event_id multiple of lcm(500,300,100)*137,
    user_id multiple of 12."""
    e_off = round_up(pc.max(ev.column("event_id")).as_py() + 1, 205500)
    u_off = round_up(pc.max(ev.column("user_id")).as_py() + 1, 12)
    return e_off, u_off


def write_events_only(ev):
    """factor-x events via a streaming writer: one replica in RAM at a
    time, so factor=100 costs the same peak memory as factor=2."""
    e_off, u_off = events_offsets(ev)
    with pq.ParquetWriter(DST / "events.parquet", ev.schema) as w:
        w.write_table(ev)
        for i in range(1, FACTOR):
            cols = []
            for name in ev.column_names:
                col = ev.column(name)
                if name == "event_id":
                    col = pc.add(col, pa.scalar(e_off * i, type=col.type))
                elif name == "user_id":
                    col = pc.add(col, pa.scalar(u_off * i, type=col.type))
                cols.append(col)
            w.write_table(pa.table(cols, names=ev.column_names))
    print(f"wrote {DST}/events.parquet x{FACTOR} (e_off={e_off}, u_off={u_off})")


SKEW_PCT = 20  # % of ALL events remapped onto 4 hot PKs (one per channel)


def write_events_skew(ev):
    """Same row count as src, but SKEW_PCT% of events land on one hot PK
    per channel: event e is remapped iff hash(event_id) % 100 < SKEW_PCT,
    to hot PK (u_max_rounded + original channel) — channel membership is
    preserved (offset multiple of 4), so each channel's fold sees one key
    holding ~SKEW_PCT% of its stream while every other key keeps ~uniform
    density. Deterministic, restatable in oracle SQL."""
    import numpy as np
    u_hot = round_up(pc.max(ev.column("user_id")).as_py() + 1, 12)
    eid = ev.column("event_id").to_numpy()
    uid = ev.column("user_id").to_numpy()
    # Multiplicative hash on event_id — deterministic, SQL-restatable, and
    # overflow-free (max event_id * 2654435761 << 2^63).
    hot = (eid * 2654435761) % 100 < SKEW_PCT
    new_uid = pa.array(np.where(hot, u_hot + uid % 4, uid), type=pa.int64())
    cols = [new_uid if name == "user_id" else ev.column(name)
            for name in ev.column_names]
    pq.write_table(pa.table(cols, names=ev.column_names), DST / "events.parquet")
    print(f"wrote {DST}/events.parquet skewed ({SKEW_PCT}% of events on 4 hot "
          f"PKs {u_hot}..{u_hot + 3})")


def write_embeddings_only(emb):
    """factor-x embeddings via a streaming writer (one replica in RAM at a
    time). vec_id offsets by a multiple of 1000; embeddings perturbed per
    (vec_id, replica, dim) with an integer-hash PRN in [-2%, +2%] of the
    component scale — deterministic, so reruns are bit-identical."""
    import numpy as np
    emb = emb.replace_schema_metadata(None)
    v_off = round_up(pc.max(emb.column("vec_id")).as_py() + 1, 1000)
    vid = emb.column("vec_id").to_numpy()
    lab = emb.column("label")
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = mat.shape
    scale = 0.02 * float(np.abs(mat).mean())
    dims = np.arange(dim, dtype=np.int64)
    # h(v, i, p) = multiplicative-hash mix, mapped to [-1, 1)
    hv = (vid[:, None] * 2654435761 + dims[None, :] * 40503) % (1 << 31)
    with pq.ParquetWriter(DST / "embeddings.parquet", emb.schema) as w:
        w.write_table(emb)
        for i in range(1, FACTOR):
            prn = ((hv + i * 2246822519) * 2654435761 % (1 << 31)) / float(1 << 30) - 1.0
            pert = (mat + scale * prn).astype(np.float32)
            w.write_table(pa.table(
                [pa.array(vid + v_off * i, type=pa.int64()),
                 pa.array(list(pert)),
                 lab],
                names=["vec_id", "embedding", "label"]).cast(emb.schema))
    print(f"wrote {DST}/embeddings.parquet x{FACTOR} (v_off={v_off}, "
          f"pert_scale={scale:.4f})")


NUM_BLOBS = 4
BLOB_PCT = 22   # % of replica vectors remapped into hot blobs
BLOB_BETA = 0.8  # |noise| / |center| -> E[cos(member, member)] ~ 1/(1+b^2) ~ 0.61


def write_embeddings_blobs(emb):
    """factor-x embeddings with NUM_BLOBS hot semantic-dup blobs — the
    dedup_semantic grid-route stress shape: most replica vectors get the
    standard ~2% perturbation (the `embeddings` mode), but BLOB_PCT% are
    remapped to center_b + BLOB_BETA*|center| noise around NUM_BLOBS seed
    vectors (vec_id < nlist, so the IVF assignment is the center's own
    cluster whp — one ~(factor*rows*BLOB_PCT/100/NUM_BLOBS)-member hot
    cluster per blob, far above the 20k kernel/grid routing threshold at
    factor 500). Within-blob cosine ~= 1/(1+BLOB_BETA^2) ~ 0.61 with
    spread, so a real fraction of pairs clears tau=0.45 and the stats
    paths are exercised, not just the dot loop. Deterministic PRN — rerun
    is bit-identical."""
    import numpy as np
    emb = emb.replace_schema_metadata(None)
    v_off = round_up(pc.max(emb.column("vec_id")).as_py() + 1, 1000)
    vid = emb.column("vec_id").to_numpy()
    lab = emb.column("label")
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = mat.shape
    scale = 0.02 * float(np.abs(mat).mean())
    dims = np.arange(dim, dtype=np.int64)
    hv = (vid[:, None] * 2654435761 + dims[None, :] * 40503) % (1 << 31)
    centers = mat[:NUM_BLOBS]  # replica-0 seed rows, preserved as-is below
    crms = np.sqrt((centers.astype(np.float64) ** 2).mean(axis=1))
    with pq.ParquetWriter(DST / "embeddings.parquet", emb.schema) as w:
        w.write_table(emb)
        for i in range(1, FACTOR):
            prn = ((hv + i * 2246822519) * 2654435761 % (1 << 31)) / float(1 << 30) - 1.0
            pert = (mat + scale * prn).astype(np.float32)
            isblob = (vid * 2654435761 + i * 97003) % 100 < BLOB_PCT
            blob = ((vid * 31 + i) % NUM_BLOBS).astype(np.int64)
            # noise per-dim RMS = BLOB_BETA * rms(center): prn RMS is
            # 1/sqrt(3), so scale by sqrt(3).
            noise = prn * (BLOB_BETA * np.sqrt(3.0) * crms[blob])[:, None]
            blobbed = (centers[blob] + noise).astype(np.float32)
            out = np.where(isblob[:, None], blobbed, pert)
            w.write_table(pa.table(
                [pa.array(vid + v_off * i, type=pa.int64()),
                 pa.array(list(out)),
                 lab],
                names=["vec_id", "embedding", "label"]).cast(emb.schema))
    per_blob = (FACTOR - 1) * n * BLOB_PCT / 100 / NUM_BLOBS
    print(f"wrote {DST}/embeddings.parquet x{FACTOR} blobs "
          f"({NUM_BLOBS} blobs ~{per_blob:.0f} members, beta={BLOB_BETA})")


HD_DIM_TILE = 12    # 64-dim base tiled to 768
HD_NUM_BLOBS = 2
HD_BLOB_PCT = 10    # % of replica vectors remapped into hot blobs


def write_embeddings_highdim(emb):
    """factor-x embeddings at PRODUCTION dim (64 x HD_DIM_TILE = 768) — the
    dimension-realism scale point: every constant the dim=64 corpora
    anchored (semantic-dedup routing threshold, gather memory, FMA floor)
    is re-measured here at a real embedding width. Each base vector is
    TILED HD_DIM_TILE times then per-(vec, replica, block, dim) hash-noise
    perturbed (~2% component scale), so magnitudes/cluster geometry follow
    the base corpus while blocks are never identical. Replica 0 (the seed
    rows: IVF centroids vec_id < 16, query sets vec_id < 8) is tiled
    without replica noise but with per-BLOCK noise so the corpus is
    genuinely 768-dim, not 12 copies of a 64-dim problem. HD_BLOB_PCT% of
    replica vectors remap into HD_NUM_BLOBS hot blobs (same recipe as
    `blobs` mode) so clusters of ~factor*rows*pct/100/blobs members sit
    ABOVE the dim-768 routing threshold (~5.8k) and the cell route is
    exercised at width. Deterministic — reruns are bit-identical."""
    import numpy as np
    emb = emb.replace_schema_metadata(None)
    v_off = round_up(pc.max(emb.column("vec_id")).as_py() + 1, 1000)
    vid = emb.column("vec_id").to_numpy()
    lab = emb.column("label")
    base = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    n, d0 = base.shape
    dim = d0 * HD_DIM_TILE
    scale = 0.02 * float(np.abs(base).mean())
    dims = np.arange(dim, dtype=np.int64)
    hv = (vid[:, None] * 2654435761 + dims[None, :] * 40503) % (1 << 31)

    def prn(salt):
        # uint64 on purpose: the multiply WRAPS (it's a multiplicative
        # hash). In int64 numpy wraps too, but silently — unadvertised
        # signed-overflow behavior that future numpy promotion rules may
        # warn on or change. uint64 wraparound is defined, and the final
        # % 2^31 reads the same low bits either way, so outputs are
        # bit-identical to the original formulation.
        h = (hv.astype(np.uint64) + np.uint64(salt) * np.uint64(2246822519)) \
            * np.uint64(2654435761)
        return (h % np.uint64(1 << 31)).astype(np.float64) \
            / float(1 << 30) - 1.0

    tiled0 = (np.tile(base, (1, HD_DIM_TILE))
              + scale * prn(0)).astype(np.float32)
    schema = pa.schema([pa.field("vec_id", pa.int64()),
                        pa.field("embedding", pa.list_(pa.float32())),
                        pa.field("label", emb.schema.field("label").type)])
    centers = tiled0[:HD_NUM_BLOBS]
    crms = np.sqrt((centers.astype(np.float64) ** 2).mean(axis=1))
    beta = 0.8
    with pq.ParquetWriter(DST / "embeddings.parquet", schema) as w:
        w.write_table(pa.table(
            [pa.array(vid, type=pa.int64()), pa.array(list(tiled0)), lab],
            names=["vec_id", "embedding", "label"]).cast(schema))
        for i in range(1, FACTOR):
            p = prn(i)
            pert = (np.tile(base, (1, HD_DIM_TILE)) + scale * p
                    ).astype(np.float32)
            isblob = (vid * 2654435761 + i * 97003) % 100 < HD_BLOB_PCT
            blob = ((vid * 31 + i) % HD_NUM_BLOBS).astype(np.int64)
            noise = p * (beta * np.sqrt(3.0) * crms[blob])[:, None]
            blobbed = (centers[blob] + noise).astype(np.float32)
            out = np.where(isblob[:, None], blobbed, pert)
            w.write_table(pa.table(
                [pa.array(vid + v_off * i, type=pa.int64()),
                 pa.array(list(out)), lab],
                names=["vec_id", "embedding", "label"]).cast(schema))
    per_blob = (FACTOR - 1) * n * HD_BLOB_PCT / 100 / HD_NUM_BLOBS
    print(f"wrote {DST}/embeddings.parquet x{FACTOR} dim={dim} "
          f"({HD_NUM_BLOBS} blobs ~{per_blob:.0f} members)")


def main():
    DST.mkdir(parents=True, exist_ok=True)
    if MODE == "highdim":
        write_embeddings_highdim(pq.read_table(SRC / "embeddings.parquet"))
        return
    if MODE == "blobs":
        write_embeddings_blobs(pq.read_table(SRC / "embeddings.parquet"))
        return
    if MODE == "embeddings":
        write_embeddings_only(pq.read_table(SRC / "embeddings.parquet"))
        return
    if MODE == "events":
        write_events_only(pq.read_table(SRC / "events.parquet"))
        # stream_vec_search scores the event stream against embeddings —
        # the one non-events table the CDC/stream suites touch.
        shutil.copyfile(SRC / "embeddings.parquet", DST / "embeddings.parquet")
        return
    if MODE == "skew":
        write_events_skew(pq.read_table(SRC / "events.parquet"))
        return
    if MODE == "documents":
        write_documents_only(pq.read_table(SRC / "documents.parquet"))
        # dedup_semantic reads embeddings; copy so the full text/dedup
        # suite set runs against this dir.
        shutil.copyfile(SRC / "embeddings.parquet", DST / "embeddings.parquet")
        return
    for t in COPY:
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")

    docs = pq.read_table(SRC / "documents.parquet")
    pq.write_table(mutated_documents(docs), DST / "documents.parquet")

    ev = pq.read_table(SRC / "events.parquet")
    e_off = round_up(pc.max(ev.column("event_id")).as_py() + 1, 205500)
    u_off = round_up(pc.max(ev.column("user_id")).as_py() + 1, 12)
    pq.write_table(replicate(ev, {"event_id": e_off, "user_id": u_off}),
                   DST / "events.parquet")

    orders = pq.read_table(SRC / "orders.parquet")
    li = pq.read_table(SRC / "lineitem.parquet")
    o_off = max(pc.max(orders.column("o_orderkey")).as_py(),
                pc.max(li.column("l_orderkey")).as_py()) + 1
    pq.write_table(replicate(orders, {"o_orderkey": o_off}),
                   DST / "orders.parquet")
    pq.write_table(replicate(li, {"l_orderkey": o_off}),
                   DST / "lineitem.parquet")
    print(f"wrote {DST}: events x{FACTOR} (e_off={e_off}, u_off={u_off}), "
          f"orders/lineitem x{FACTOR} (o_off={o_off}), documents x{FACTOR} "
          f"near-dup ({MUTATE_PCT}% token mutation), {len(COPY)} copied")


if __name__ == "__main__":
    main()
