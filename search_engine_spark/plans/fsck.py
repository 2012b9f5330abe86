"""Index integrity checker (fsck): decode-level invariants a healthy
index must satisfy, verified with the serving-side pyarrow reader
machinery — no Spark job.

Checks (each failure is one entry in the returned ``errors`` list):

  I1 df-consistency — dictionary ``df`` equals the count of DISTINCT
     decoded doc ids for the term. Tombstones are deliberately NOT
     applied: df is a build-time constant frozen until compaction
     (plans/deletes.py contract), so logical deletes must not change
     this invariant.
  I2 no duplicate (term, doc_id) postings — the corruption class the
     round-1 extend-offset bug produced (doc-id ranges of two builds
     overlapping after an --extend).
  I3 segment order — within every (salt, seg) blob the decoded doc
     ids are strictly increasing and the blob length equals the
     stored ``n``.
  I4 bucket routing — the term's dictionary row lives in exactly the
     bucket ``functions.hashing.term_bucket`` routes it to (a routing
     mismatch silently makes the term unfindable at serving time).
  I5 tombstone referents — every tombstoned doc id exists in urlmap
     (only checked when the index was built from pages input).
  I6 stats sanity — n_docs > 0, avgdl > 0, and every decoded doclen
     positive.
  I7 positions agreement — when the positional table exists AND was
     built with the same analyzer (stem flag) as the index, the
     position count ``npos`` for a sampled (term, doc) equals the
     postings ``tf`` (positions are one offset per occurrence).

Sampling: ``sample_terms`` terms are chosen deterministically
(seeded) from the dictionary, always including the highest-df terms
(most segments, salted — the richest invariant surface). The
dictionary is read in full here; at a 10^8-term vocabulary, sample
row groups via the parquet footer index instead (same pattern as
plans/wand.py) — the per-term checks are already O(term postings).
"""

from __future__ import annotations

import json
import os

import numpy as np

from search_engine_spark.functions.codec import decode_postings, decode_varints
from search_engine_spark.functions.hashing import term_bucket
from search_engine_spark.plans.deletes import load_tombstones


def _check_term(term: str, df: int, bucket: int, searcher, errors: list,
                n_buckets: int) -> np.ndarray:
    """Run I1-I4 + I6(doclen) for one term; returns decoded doc ids."""
    if term_bucket(term, n_buckets) != bucket:
        errors.append(
            f"I4 bucket routing: term {term!r} stored in bucket {bucket} "
            f"but routes to {term_bucket(term, n_buckets)}"
        )
    segs = searcher._segments(term)
    all_docs = []
    for salt, group in segs.groupby("salt"):
        group = group.sort_values("seg")
        prev_last = None
        for row in group.itertuples(index=False):
            docs, tfs = decode_postings(row.doc_ids, row.tfs)
            dls = decode_varints(row.doclens)
            if not (len(docs) == len(tfs) == len(dls) == row.n):
                errors.append(
                    f"I3 length: {term!r} salt={salt} seg={row.seg} "
                    f"n={row.n} decoded={len(docs)}/{len(tfs)}/{len(dls)}"
                )
            if len(docs) and np.any(np.diff(docs) <= 0):
                errors.append(
                    f"I3 order: {term!r} salt={salt} seg={row.seg} "
                    "doc_ids not strictly increasing"
                )
            if prev_last is not None and len(docs) and docs[0] <= prev_last:
                errors.append(
                    f"I3 order: {term!r} salt={salt} seg={row.seg} "
                    "overlaps previous segment"
                )
            if len(docs):
                prev_last = int(docs[-1])
            if np.any(dls <= 0):
                errors.append(
                    f"I6 doclen: {term!r} salt={salt} seg={row.seg} "
                    "non-positive doclen"
                )
            all_docs.append(docs)
    docs = np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)
    uniq = np.unique(docs)
    if uniq.size != docs.size:
        errors.append(
            f"I2 duplicates: {term!r} has {docs.size - uniq.size} "
            "duplicate (term, doc_id) postings"
        )
    if uniq.size != df:
        errors.append(
            f"I1 df: {term!r} dictionary df={df} but postings hold "
            f"{uniq.size} distinct docs"
        )
    return docs


def _check_positions(index_dir: str, terms, searcher, errors: list) -> int:
    """I7 for the sampled terms that exist in the positional table."""
    import pyarrow.dataset as ds

    checked = 0
    dataset = ds.dataset(
        os.path.join(index_dir, "positions"), format="parquet",
        partitioning="hive",
    )
    for term in terms:
        tbl = dataset.to_table(
            columns=["term", "doc_id", "npos"],
            filter=ds.field("term") == term,
        )
        if tbl.num_rows == 0:
            continue
        checked += 1
        pos_n = dict(zip(tbl["doc_id"].to_pylist(), tbl["npos"].to_pylist()))
        segs = searcher._segments(term)
        for row in segs.itertuples(index=False):
            docs, tfs = decode_postings(row.doc_ids, row.tfs)
            for d, tf in zip(docs, tfs):
                got = pos_n.get(int(d))
                if got != int(tf):
                    errors.append(
                        f"I7 positions: {term!r} doc {int(d)} tf={int(tf)} "
                        f"but npos={got}"
                    )
    return checked


def fsck(index_dir: str, *, sample_terms: int = 200, seed: int = 7) -> dict:
    """Run all integrity checks; returns a JSON-able summary with the
    (possibly empty) ``errors`` list. Never raises on corruption —
    callers branch on ``ok``."""
    import pyarrow.parquet as pq

    from search_engine_spark.plans.wand import LocalSearcher

    errors: list[str] = []
    searcher = LocalSearcher(index_dir)
    if searcher.n_docs <= 0:
        errors.append(f"I6 stats: n_docs={searcher.n_docs}")
    if not searcher.avgdl > 0:
        errors.append(f"I6 stats: avgdl={searcher.avgdl}")

    dic = pq.read_table(
        os.path.join(index_dir, "dictionary"),
        columns=["term", "df", "bucket"],
    ).to_pandas()
    head = dic.nlargest(min(10, len(dic)), "df")
    rng = np.random.default_rng(seed)
    rest = dic.drop(head.index)
    n_rand = min(max(sample_terms - len(head), 0), len(rest))
    sample = rest.iloc[rng.choice(len(rest), size=n_rand, replace=False)]
    import pandas as pd

    picked = pd.concat([head, sample])
    for row in picked.itertuples(index=False):
        _check_term(row.term, int(row.df), int(row.bucket), searcher,
                    errors, searcher.n_buckets)

    urlmap_path = os.path.join(index_dir, "urlmap")
    tombs = load_tombstones(index_dir)
    tombstones_checked = False
    if tombs.size and os.path.isdir(urlmap_path):
        ids = pq.read_table(urlmap_path, columns=["doc_id"])["doc_id"]
        known = np.sort(np.asarray(ids.to_pylist(), dtype=np.int64))
        pos = np.searchsorted(known, tombs)
        pos_c = np.minimum(pos, known.size - 1)
        missing = tombs[known[pos_c] != tombs] if known.size else tombs
        for d in missing[:20]:
            errors.append(f"I5 tombstone: deleted doc {int(d)} not in urlmap")
        tombstones_checked = True

    positions_checked = 0
    pos_meta = os.path.join(index_dir, "positions_meta.json")
    idx_meta = os.path.join(index_dir, "index_meta.json")
    if os.path.exists(pos_meta) and os.path.exists(idx_meta):
        with open(pos_meta) as f:
            pstem = json.load(f).get("stem")
        with open(idx_meta) as f:
            istem = json.load(f).get("stem")
        if istem is not None and pstem == istem:
            positions_checked = _check_positions(
                index_dir, list(picked.term[:20]), searcher, errors
            )

    return {
        "index_dir": index_dir,
        "terms_checked": int(len(picked)),
        "positions_terms_checked": positions_checked,
        "tombstones_checked": tombstones_checked,
        "n_errors": len(errors),
        "errors": errors[:50],
        "ok": not errors,
    }
