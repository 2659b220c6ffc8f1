from .classify import train_rf, predict, dual_model_predict, save_model, load_model

__all__ = ["train_rf", "predict", "dual_model_predict", "save_model", "load_model"]
