"""Golden-value tests for ddpm_schedules — bit-parity with the reference
formulation (new_scripy.py:358-384), cross-checked against torch when
available."""

import numpy as np
import pytest

from diffusionmodel_tpu.schedules import SCHEDULE_KEYS, ddpm_schedules, ddpm_schedules_np


@pytest.mark.parametrize("T", [400, 500, 700])
def test_schedule_shapes_and_ranges(T):
    s = ddpm_schedules(1e-4, 0.02, T)
    assert set(s) == set(SCHEDULE_KEYS)
    for k, v in s.items():
        assert v.shape == (T + 1,), k
        assert v.dtype == np.float32, k
    s = {k: np.asarray(v) for k, v in s.items()}
    # endpoint semantics: index 0 carries beta1 exactly.
    assert s["sqrt_beta_t"][0] == np.float32(np.sqrt(np.float32(1e-4)))
    assert np.isclose(s["sqrt_beta_t"][T] ** 2, 0.02, rtol=1e-6)
    assert np.all(np.diff(s["alphabar_t"]) < 0)
    assert 0 < s["alphabar_t"][T] < s["alphabar_t"][0] < 1


def test_schedule_matches_numpy_twin():
    sj = {k: np.asarray(v) for k, v in ddpm_schedules(1e-4, 0.02, 700).items()}
    sn = ddpm_schedules_np(1e-4, 0.02, 700)
    for k in SCHEDULE_KEYS:
        np.testing.assert_allclose(sj[k], sn[k], rtol=1e-5, atol=5e-6, err_msg=k)


def test_schedule_identity_mab():
    # mab_over_sqrtmab == (1-alpha)/sqrtmab by construction — verified
    # against a float64 recomputation. (The buffers are correctly-rounded
    # fp32 of float64 math; rebuilding the identity from the fp32-rounded
    # alpha would inject ~ulp(alpha)/beta cancellation error, so the fp32
    # identity only holds against the f64 pipeline.)
    s = {k: np.asarray(v, np.float64)
         for k, v in ddpm_schedules(1e-4, 0.02, 700).items()}
    t = np.arange(0, 701, dtype=np.float64)
    beta = (0.02 - 1e-4) * t / 700 + 1e-4
    ab = np.exp(np.cumsum(np.log(1 - beta)))
    np.testing.assert_allclose(
        s["mab_over_sqrtmab"], beta / np.sqrt(1 - ab), rtol=1e-6
    )


def test_schedule_parity_vs_torch_reference():
    torch = pytest.importorskip("torch")
    T = 700
    beta1, beta2 = 1e-4, 0.02
    # The reference formulation, re-expressed in torch (new_scripy.py:358-384).
    beta_t = (beta2 - beta1) * torch.arange(0, T + 1, dtype=torch.float32) / T + beta1
    alpha_t = 1 - beta_t
    alphabar_t = torch.cumsum(torch.log(alpha_t), dim=0).exp()
    expect = {
        "alpha_t": alpha_t,
        "oneover_sqrta": 1 / torch.sqrt(alpha_t),
        "sqrt_beta_t": torch.sqrt(beta_t),
        "alphabar_t": alphabar_t,
        "sqrtab": torch.sqrt(alphabar_t),
        "sqrtmab": torch.sqrt(1 - alphabar_t),
        "mab_over_sqrtmab": (1 - alpha_t) / torch.sqrt(1 - alphabar_t),
    }
    got = ddpm_schedules(beta1, beta2, T)
    for k in SCHEDULE_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), expect[k].numpy(), rtol=1e-5, atol=5e-6, err_msg=k
        )
