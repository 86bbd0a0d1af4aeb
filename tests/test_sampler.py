"""Serving Sampler wrapper: all four workflows through the compiled paths."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.models.sampler import Sampler

from tests.test_models_parity import random_batch
from tests.test_training import SMALL


@pytest.mark.slow
def test_sampler_workflows():
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    # xla frame decoder on the CPU test mesh (pallas path covered by
    # interpret-mode tests; compiled pallas needs TPU)
    s = Sampler(params, SMALL, frame_decoder="xla")
    x, c, pr_mat = random_batch(2, seed=50)
    x2, c2, pr2 = random_batch(2, seed=51)
    K1 = SMALL.pianotree.max_simu_note - 1
    key = jax.random.PRNGKey(1)

    est = s.swap(pr_mat, pr2, c, c2, fix_rhy=False, fix_chd=True)
    assert est.shape == (2, 32, K1, 6)
    # swap == reconstruct of the mixed sources
    est2 = s.reconstruct(pr2, c)
    np.testing.assert_array_equal(est, est2)

    est = s.posterior_sample(key, pr_mat, c, scale=0.5)
    assert est.shape == (2, 32, K1, 6)
    est = s.prior_sample(key, pr_mat, c, sample_rhy=True)
    assert est.shape == (2, 32, K1, 6)
    est = s.interp(pr_mat, c, pr2, c2, interp_chd=True, int_count=3)
    assert est.shape == (2, 3, 32, K1, 6)

    # interp against the functional API
    want = dv.interp(params, SMALL, jnp.asarray(pr_mat), jnp.asarray(c),
                     jnp.asarray(pr2), jnp.asarray(c2), interp_chd=True,
                     int_count=3)
    np.testing.assert_array_equal(est, want)
