"""Loss parity vs numpy oracles that use real boolean filtering (the
reference's dynamic-shape behaviour), validating our masked static-shape
formulations."""

import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu.models import losses as L


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def make_case(rng, C=19, shape=(1, 6, 6, 4)):
    logits = rng.randn(*shape, C).astype(np.float32) * 2
    target = rng.randint(0, C, size=shape)
    ignore = rng.rand(*shape) < 0.2
    target = np.where(ignore, 255, target)
    return logits, target


def np_geo_scal(logits, target, non_empty_idx=18):
    pred = _softmax(logits)
    empty = pred[..., non_empty_idx].ravel()
    nonempty = 1 - empty
    t = target.ravel()
    m = t != 255
    nonempty_t = (t != non_empty_idx)[m].astype(np.float32)
    nonempty_p, empty_p = nonempty[m], empty[m]
    eps = 1e-5
    inter = (nonempty_t * nonempty_p).sum()
    precision = inter / (nonempty_p.sum() + eps)
    recall = inter / (nonempty_t.sum() + eps)
    spec = ((1 - nonempty_t) * empty_p).sum() / ((1 - nonempty_t).sum() + eps)

    def nl(x):
        return -np.log(np.clip(x, 1e-5, 1 - 1e-5))
    return nl(precision) + nl(recall) + nl(spec)


def np_sem_scal(logits, target):
    C = logits.shape[-1]
    pred = _softmax(logits).reshape(-1, C)
    t = target.ravel()
    m = t != 255
    loss, count = 0.0, 0
    begin = 1 if C == 19 else 0

    def nl(x):
        return -np.log(np.clip(x, 1e-5, 1 - 1e-5))
    for i in range(begin, C - 1):
        p = pred[m, i]
        ct = (t[m] == i).astype(np.float32)
        if ct.sum() > 0:
            count += 1
            nom = (p * ct).sum()
            lc = 0.0
            if p.sum() > 0:
                lc += nl(nom / (p.sum() + 1e-5))
            lc += nl(nom / (ct.sum() + 1e-5))
            if (1 - ct).sum() > 0:
                lc += nl(((1 - p) * (1 - ct)).sum() / ((1 - ct).sum() + 1e-5))
            loss += lc
    return loss / count


def np_lovasz(logits, target):
    C = logits.shape[-1]
    pred = _softmax(logits).reshape(-1, C)
    t = target.ravel()
    m = t != 255
    pred, t = pred[m], t[m]
    losses = []
    for c in range(C):
        fg = (t == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - pred[:, c])
        order = np.argsort(-errors, kind="stable")
        es, fs = errors[order], fg[order]
        gts = fs.sum()
        inter = gts - np.cumsum(fs)
        union = gts + np.cumsum(1 - fs)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((np.maximum(es, 0) * jac).sum())
    return np.mean(losses)


def np_focal(logits, target, cw, dist, gamma=2.0, alpha=0.25, lw=100.0):
    B, H, W, D, C = logits.shape
    m = (target != 255).ravel()
    lg = logits.reshape(-1, C)[m]
    t = target.ravel()[m]
    onehot = np.eye(C)[t]
    p = 1 / (1 + np.exp(-lg))
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    bce = np.maximum(lg, 0) - lg * onehot + np.log1p(np.exp(-np.abs(lg)))
    dvox = np.broadcast_to(dist[None, :, :, None], (B, H, W, D)).ravel()[m]
    wmask = cw[None, :] * dvox[:, None]
    return lw * (bce * fw * wmask).sum(-1).mean()


def test_geo_scal(rng):
    logits, target = make_case(rng)
    ours = float(L.geo_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(ours, np_geo_scal(logits, target), rtol=1e-4)


def test_sem_scal(rng):
    logits, target = make_case(rng)
    ours = float(L.sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(ours, np_sem_scal(logits, target), rtol=1e-4)


def test_lovasz(rng):
    logits, target = make_case(rng)
    ours = float(L.lovasz_softmax_loss(jnp.asarray(logits),
                                       jnp.asarray(target),
                                       method="sort"))
    np.testing.assert_allclose(ours, np_lovasz(logits, target), rtol=1e-4)


def test_lovasz_default_is_hist(rng, monkeypatch):
    # round-5 default flip (on-chip A/B: train step 385.5 -> 281.4 ms,
    # docs/PERF.md); explicit env still wins
    monkeypatch.delenv("FBBEV_LOVASZ", raising=False)
    logits, target = make_case(rng)
    dflt = float(L.lovasz_softmax_loss(jnp.asarray(logits),
                                       jnp.asarray(target)))
    hist = float(L.lovasz_softmax_loss(jnp.asarray(logits),
                                       jnp.asarray(target),
                                       method="hist"))
    assert dflt == hist


def test_focal(rng):
    logits, target = make_case(rng, shape=(1, 6, 6, 4))
    cw = L.occ_class_weights(19)
    dist = L.bev_distance_weight(6, 6)
    ours = float(L.focal_ce_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(cw),
        jnp.asarray(dist)))
    ref = np_focal(logits, target, cw, dist)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_ce_ssc(rng):
    logits, target = make_case(rng)
    cw = L.occ_class_weights(19)
    ours = float(L.ce_ssc_loss(jnp.asarray(logits), jnp.asarray(target),
                               jnp.asarray(cw)))
    # torch CrossEntropyLoss oracle
    import torch
    import torch.nn.functional as F
    ref = F.cross_entropy(
        torch.from_numpy(logits.reshape(-1, 19)),
        torch.from_numpy(target.reshape(-1)),
        weight=torch.from_numpy(cw), ignore_index=255).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_class_weights_and_distance_map():
    cw = L.occ_class_weights(19)
    assert cw.shape == (19,) and cw[0] == 0.0 and (cw[1:] > 0).all()
    d = L.bev_distance_weight(200, 200)
    assert d.min() >= 1.0 and abs(d.max() - 2.0) < 1e-5
    assert d[100, 100] < d[0, 0]


def test_gt_mode_pool_matches_torch_oracle(rng):
    """downsample_gt_mode_pool vs a torch re-execution of the reference's
    exact steps (occupancy_head.py:217-228)."""
    import torch

    from fbbev_tpu.models.occ_head import downsample_gt_mode_pool

    B, H, W, D, r = 2, 8, 8, 4, 2
    # labels: mostly empty(18), some classes, some noise(0), some 255
    t = np.full((B, H, W, D), 18, np.int64)
    m = rng.rand(B, H, W, D)
    t[m < 0.3] = rng.randint(1, 18, (m < 0.3).sum())
    t[m > 0.95] = 0
    t[(m > 0.9) & (m <= 0.95)] = 255

    def torch_oracle(target_voxels, ratio, empty_idx=18):
        tv = torch.from_numpy(target_voxels.copy())
        Bt, Ht, Wt, Dt = tv.shape
        tv = tv.reshape(Bt, Ht // ratio, ratio, Wt // ratio, ratio,
                        Dt // ratio, ratio).permute(
            0, 1, 3, 5, 2, 4, 6).reshape(
            Bt, Ht // ratio, Wt // ratio, Dt // ratio, ratio ** 3)
        empty_mask = tv.sum(-1) == empty_idx
        tv = tv.to(torch.int64)
        occ_space = tv[~empty_mask]
        occ_space[occ_space == 0] = -torch.arange(
            len(occ_space[occ_space == 0])) - 1
        tv[~empty_mask] = occ_space
        tv = torch.mode(tv, dim=-1)[0]
        tv[tv < 0] = 255
        return tv.numpy()

    got = np.asarray(downsample_gt_mode_pool(jnp.asarray(t), r))
    want = torch_oracle(t, r)
    np.testing.assert_array_equal(got, want)

    # ratio 4 and a crafted block exercising every branch
    t2 = np.full((1, 4, 4, 4), 18, np.int64)
    t2[0, :2, :2, :2] = 0            # all-noise block -> 255
    t2[0, :2, 2:, :2] = [[[3, 7], [7, 3]], [[5, 2], [9, 11]]]  # distinct->255
    t2[0, 2:, :2, :2] = [[[4, 4], [0, 255]], [[255, 1], [2, 18]]]  # 4 wins
    got2 = np.asarray(downsample_gt_mode_pool(jnp.asarray(t2), 2))
    want2 = torch_oracle(t2, 2)
    np.testing.assert_array_equal(got2, want2)


def test_lovasz_hist_matches_sort(rng):
    """The counting-sort Lovasz (method="hist") must agree with the exact
    batched-sort formulation to within its quantization bound (~1/bins),
    including its gradient direction."""
    logits, target = make_case(rng)
    exact = float(L.lovasz_softmax_loss(jnp.asarray(logits),
                                        jnp.asarray(target)))
    hist = float(L.lovasz_softmax_loss(jnp.asarray(logits),
                                       jnp.asarray(target), method="hist"))
    assert abs(hist - exact) < 3e-3, (hist, exact)
    np.testing.assert_allclose(hist, np_lovasz(logits, target), atol=3e-3)

    # gradient: the hist VJP is the bin-averaged Lovasz coefficient --
    # cosine similarity with the exact sort VJP should be high
    g_exact = jax.grad(lambda x: L.lovasz_softmax_loss(
        x, jnp.asarray(target)))(jnp.asarray(logits))
    g_hist = jax.grad(lambda x: L.lovasz_softmax_loss(
        x, jnp.asarray(target), method="hist"))(jnp.asarray(logits))
    a = np.asarray(g_exact).ravel()
    b = np.asarray(g_hist).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.98, cos
