from cu2rec_tpu.serve.foldin import fold_in_user
from cu2rec_tpu.serve.recommend import (
    predict_all_items, recommend_users, ranked_items, recall_at_k_eval,
    ranking_eval, foldin_ranking_eval,
    padded_user_lists,
)

__all__ = ["fold_in_user", "predict_all_items", "recommend_users",
           "ranked_items", "recall_at_k_eval", "ranking_eval",
           "foldin_ranking_eval", "padded_user_lists"]
