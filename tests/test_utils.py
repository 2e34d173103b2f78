import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu.models.layers import ConvBN
from fbbev_tpu.utils import CsvLogger, flops_estimate, fold_batch_norms


def test_fold_batch_norms_preserves_output(rng):
    m = ConvBN(6, 3, padding=1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    # give BN non-trivial running stats
    variables = jax.tree.map(np.asarray, variables)
    variables["batch_stats"]["bn"]["mean"] = rng.randn(6).astype(np.float32)
    variables["batch_stats"]["bn"]["var"] = (
        rng.rand(6).astype(np.float32) + 0.5)
    variables["params"]["bn"]["scale"] = rng.rand(6).astype(np.float32) + 0.5
    variables["params"]["bn"]["bias"] = rng.randn(6).astype(np.float32)

    ref = m.apply(variables, x, False)
    folded = fold_batch_norms(variables)
    out = m.apply(folded, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(
        folded["batch_stats"]["bn"]["mean"], np.zeros(6))


def test_flops_estimate():
    def f(a, b):
        return a @ b

    cost = flops_estimate(f, jnp.zeros((64, 32)), jnp.zeros((32, 16)))
    assert cost["flops"] and cost["flops"] >= 2 * 64 * 32 * 16 * 0.9


def test_csv_logger(tmp_path):
    log = CsvLogger(str(tmp_path))
    log({"iter": 1, "loss": 2.5})
    log({"iter": 2, "loss": 2.1})
    rows = open(log.path).read().strip().split("\n")
    assert rows[0] == "iter,loss" and len(rows) == 3
