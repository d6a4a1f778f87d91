from cu2rec_tpu.train.trainer import (
    train, train_with_engine, SingleChipEngine, run_steps, single_step,
    eval_segments,
)

__all__ = ["train", "train_with_engine", "SingleChipEngine", "run_steps",
           "single_step", "eval_segments"]
