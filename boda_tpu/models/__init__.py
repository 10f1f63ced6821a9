from .zoo import build_model, MODEL_BUILDERS
