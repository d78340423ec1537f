"""Per-example rank dump: JSONL of {"Rank", "Result": record} per aligned
example (reference: full_dset_retrieval.py:419-429,591-613)."""
import json

import numpy as np

from medvill_tpu.train.retrieve import run_retrieval_eval


def test_rank_dump_format(tmp_path):
    # pool of 4 candidates per query, 2 queries; score_step echoes scores
    records = [{"id": i, "text": f"t{i}"} for i in range(8)]
    scores = np.array([0.1, 0.9, 0.2, 0.3,   # query 0: aligned idx1 rank 0
                       0.8, 0.1, 0.7, 0.6])  # query 1: aligned idx6 rank 1
    labels = np.array([0, 1, 0, 0, 0, 0, 1, 0])
    batches = [dict(score=scores[i:i + 4], is_aligned=labels[i:i + 4],
                    index=np.arange(i, i + 4, dtype=np.int32))
               for i in (0, 4)]

    def score_step(state, batch):
        return batch["score"]

    path = str(tmp_path / "rank_result_at_eval.json")
    out = run_retrieval_eval(score_step, None, batches, eval_len_size=4,
                             direction="i2t", rank_dump_path=path,
                             records=records)
    lines = [json.loads(l) for l in open(path)]
    assert lines == [{"Rank": 0, "Result": {"id": 1, "text": "t1"}},
                     {"Rank": 1, "Result": {"id": 6, "text": "t6"}}]
    assert out["rank_dump"] == path
