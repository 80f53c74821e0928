from .lbessel import lbessel
from .losses import (
    gaussian_kl,
    uniform_kl,
    nb_nllik,
    nb_loss,
    vmf_loss,
    kl_weight_schedule,
    l2_normalize,
)
from .initializers import torch_linear_init, linear_apply
