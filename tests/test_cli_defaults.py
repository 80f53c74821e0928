"""CLI/model defaults must equal the reference ctor defaults.

Reference: vmf.hh:61-62 (kappa .1/10.), vmfnb.hh:76-77 (joint .1/10.),
vmfnb_mixture.hh:74-75 (mixture .1/100.).  Round-3 verdict "Missing #1":
a default-flag run must train the same model the reference would.
"""

from mmvae_tpu.cli.common import compose_parsers
from mmvae_tpu.cli import vmf_vae, vmfnb_vae
from mmvae_tpu.cli.vmfnb_vae import resolve_kappa_defaults
from mmvae_tpu.models.vmf import VMFVAE
from mmvae_tpu.models.vmfnb import VMFNBVAE
from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE
import numpy as np


def _defaults(model_args):
    parser = compose_parsers("t", model_args)
    ns, _ = parser.parse_known_args(
        ["--mtx", "x.mtx.gz", "--out", "/tmp/o"]
    )
    return ns


def test_vmf_cli_kappa_defaults_match_reference():
    ns = _defaults(vmf_vae._model_args)
    assert ns.kappa_min == 0.1 and ns.kappa_max == 10.0


def test_vmfnb_cli_kappa_defaults_match_reference():
    ns = _defaults(vmfnb_vae._model_args)
    # joint mode (no --annot): vmfnb.hh:76-77
    assert resolve_kappa_defaults(ns.kappa_min, ns.kappa_max, False) == (
        0.1, 10.0,
    )
    # mixture mode (--annot): vmfnb_mixture.hh:74-75
    assert resolve_kappa_defaults(ns.kappa_min, ns.kappa_max, True) == (
        0.1, 100.0,
    )
    # explicit flags always win over the per-mode defaults
    assert resolve_kappa_defaults(2.0, 50.0, True) == (2.0, 50.0)


def test_model_ctor_kappa_defaults_match_reference():
    assert (VMFVAE.__dataclass_fields__["kappa_min"].default,
            VMFVAE.__dataclass_fields__["kappa_max"].default) == (0.1, 10.0)
    assert (VMFNBVAE.__dataclass_fields__["kappa_min"].default,
            VMFNBVAE.__dataclass_fields__["kappa_max"].default) == (0.1, 10.0)
    assert (
        VMFNBMixtureVAE.__dataclass_fields__["kappa_min"].default,
        VMFNBMixtureVAE.__dataclass_fields__["kappa_max"].default,
    ) == (0.1, 100.0)


def test_default_constructed_models_use_reference_kappa():
    m = VMFNBVAE(data_dim=16)
    assert m.kappa_min == 0.1 and m.kappa_max == 10.0
    L = np.eye(8, 2, dtype=np.float32)
    mm = VMFNBMixtureVAE(label=L)
    assert mm.kappa_min == 0.1 and mm.kappa_max == 100.0
