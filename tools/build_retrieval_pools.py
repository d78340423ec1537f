"""Build retrieval eval candidate pools from a trainer JSONL.

The reference evaluates retrieval over PRE-BUILT candidate-pool JSONLs —
``eval_len_size`` candidates per query with ``is_aligned`` labels
(full_dset_retrieval.py:145-162, pools of 759/1536/710/354 per
full_dset_retrieval.py:652) — but ships no tool that builds them; the
published pools were prepared offline by the authors.  This is that tool:
from a ``{id, split, label, text, img}`` JSONL (e.g. prepare_mimic.py
output) it emits pools in the reference's published row layout
(full_dset_retrieval.py:147)::

  {"id": <query study>, "split": ..., "label": <query label>,
   "is_aligned": [1|0], "T_label": <candidate text's label>,
   "r_id": <candidate id>, "txt": <text>, "img": <image path>}

Protocols (the two eval dataset families the reference wires,
full_dset_retrieval.py:564-585):

- ``label_conditioned`` (default): negatives are candidates whose CheXpert
  label set DIFFERS from the query's (the fuzzy token-sort equality of
  data/sampling.py::labels_match, reference dataset_origin.py:225);
- ``studyID``: negatives are any other record (different study only).

Directions: ``i2t`` keeps the query image fixed and varies the candidate
text; ``t2i`` keeps the text and varies the image.  Every query contributes
one pool: its aligned pair plus ``pool_size - 1`` sampled negatives,
shuffled.  The output feeds ``--eval_dataset``/``--*_test_dataset`` of the
retrieval CLI with ``--eval_len_size`` = ``--pool_size``.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
from typing import Dict, List

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from medvill_tpu.data.sampling import _token_sort_key  # noqa: E402


def build_pools(records: List[dict], pool_size: int, direction: str = "i2t",
                label_conditioned: bool = True, seed: int = 0,
                allow_replacement: bool = False) -> List[dict]:
    """One shuffled pool of ``pool_size`` rows per query record."""
    rng = random.Random(seed)
    rows: List[dict] = []
    # label equality is the fuzzy token-sort test (sampling.labels_match);
    # precompute each record's key once so negative selection is O(n) per
    # query instead of O(n) key computations per candidate
    keys = [_token_sort_key(r["label"]) for r in records]
    # the candidate field that varies within a pool: a negative whose value
    # EQUALS the query's own would be the aligned pair mislabeled 0 (e.g.
    # two frontal dicoms of one study share the report text) — exclude by
    # content, since records carry no study key
    vary = "text" if direction == "i2t" else "img"
    for qi, q in enumerate(records):
        negatives = [r for j, r in enumerate(records) if j != qi
                     and (not label_conditioned or keys[j] != keys[qi])
                     and r[vary] != q[vary]]
        n_need = pool_size - 1
        # diagnose the unfixable case FIRST: with zero eligible negatives
        # --allow_replacement cannot help, so advising it would send the
        # user through a second O(n^2) build for the same failure
        if not negatives and n_need > 0:
            raise ValueError(
                f"query {q.get('id', qi)}: no eligible negatives at all "
                f"(label {q['label']!r} under "
                f"{'label_conditioned' if label_conditioned else 'studyID'} "
                "protocol) — --allow_replacement cannot help; drop the "
                "query or use the other protocol")
        if len(negatives) < n_need and not allow_replacement:
            raise ValueError(
                f"query {q.get('id', qi)}: only {len(negatives)} eligible "
                f"negatives for pool_size={pool_size}; lower --pool_size or "
                "pass --allow_replacement")
        if len(negatives) >= n_need:
            chosen = rng.sample(negatives, n_need)
        else:
            chosen = [rng.choice(negatives) for _ in range(n_need)]
        pool = [(q, 1)] + [(c, 0) for c in chosen]
        rng.shuffle(pool)
        for cand, aligned in pool:
            rows.append({
                "id": q.get("id", str(qi)),
                "split": q.get("split", ""),
                "label": q["label"],
                "is_aligned": [aligned],
                "T_label": cand["label"],
                "r_id": cand.get("id", ""),
                # i2t: query image vs candidate texts; t2i: query text vs
                # candidate images (full_dset_retrieval.py i2t/t2i switches)
                "txt": cand["text"] if direction == "i2t" else q["text"],
                "img": q["img"] if direction == "i2t" else cand["img"],
            })
    return rows


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--src", required=True,
                   help="input JSONL of {id, split, label, text, img} rows "
                        "(every row becomes one query)")
    p.add_argument("--out", required=True, help="output pool JSONL")
    p.add_argument("--pool_size", type=int, default=759,
                   help="candidates per query incl. the aligned pair "
                        "(reference eval_len_size, "
                        "full_dset_retrieval.py:652)")
    p.add_argument("--direction", choices=["i2t", "t2i"], default="i2t")
    p.add_argument("--protocol", choices=["label_conditioned", "studyID"],
                   default="label_conditioned")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--allow_replacement", action="store_true",
                   help="sample negatives with replacement when fewer than "
                        "pool_size-1 are eligible")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    with open(args.src, encoding="utf-8") as f:
        records = [json.loads(l) for l in f]
    rows = build_pools(records, args.pool_size, args.direction,
                       label_conditioned=(args.protocol
                                          == "label_conditioned"),
                       seed=args.seed,
                       allow_replacement=args.allow_replacement)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(json.dumps({"queries": len(records), "rows": len(rows),
                      "pool_size": args.pool_size}))


if __name__ == "__main__":
    main()
