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


def test_tensorboard_logger_format(tmp_path):
    """The hand-encoded events file must round-trip through the Event
    proto (record framing + masked CRCs + field encoding)."""
    import struct

    from fbbev_tpu.utils.logging_hooks import TensorboardLogger, _masked_crc

    tb = TensorboardLogger(str(tmp_path))
    tb({"iter": 7, "loss_total": 3.5, "note": "skipme"})
    data = open(tb.path, "rb").read()
    off, recs = 0, []
    while off < len(data):
        (ln,) = struct.unpack("<Q", data[off:off + 8])
        (hc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + ln]
        (pc,) = struct.unpack("<I", data[off + 12 + ln:off + 16 + ln])
        assert pc == _masked_crc(payload)
        recs.append(payload)
        off += 16 + ln
    assert len(recs) == 2  # version header + one metric event
    try:
        from tensorboard.compat.proto.event_pb2 import Event
    except ImportError:
        return
    e = Event()
    e.ParseFromString(recs[1])
    assert e.step == 7
    vals = {v.tag: v.simple_value for v in e.summary.value}
    assert vals == {"loss_total": 3.5}
