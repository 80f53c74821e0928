from .config import MMVaeOptions, TrainingOptions
from .loop import Trainer, train_vae_model, visit_vae_model
from .recorder import LatentRecorder, zeropad
