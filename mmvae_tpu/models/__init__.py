from .nb import NBVAE, NBVAEOutput
from .vmf import VMFVAE, VMFVAEOutput
from .vmfnb import VMFNBVAE, VMFNBVAEOutput
from .vmfnb_mixture import VMFNBMixtureVAE, VMFNBMixtureOutput
