from cu2rec_tpu.ops.sgd import (
    Hyper, sample_items, elect_winners, win_mask, sgd_step,
    apply_item_deltas, rotated_priority,
)
from cu2rec_tpu.ops.loss import evaluate, pairwise_errors, error_sums, \
    metrics_from_errors
from cu2rec_tpu.ops.model import predict_pairs, score_catalog
from cu2rec_tpu.ops.topk import (topk_scores, mask_rated, recall_at_k,
                                 ndcg_at_k)

__all__ = [
    "Hyper", "sample_items", "elect_winners", "win_mask", "sgd_step",
    "apply_item_deltas", "rotated_priority", "evaluate", "pairwise_errors",
    "error_sums", "metrics_from_errors", "predict_pairs", "score_catalog",
    "topk_scores", "mask_rated", "recall_at_k", "ndcg_at_k",
]
