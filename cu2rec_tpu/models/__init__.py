from cu2rec_tpu.models.state import (
    MFModel, init_model, initialize_normal, model_to_numpy, COMPONENTS,
)

__all__ = ["MFModel", "init_model", "initialize_normal", "model_to_numpy",
           "COMPONENTS"]
