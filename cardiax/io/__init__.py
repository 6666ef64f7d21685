from cardiax.io.metrics import MetricsTracker
from cardiax.io.export import save_predictions, save_trained_models

__all__ = ["MetricsTracker", "save_predictions", "save_trained_models"]
