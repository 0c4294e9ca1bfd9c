"""Loss/metric parity against torch oracles implementing the reference formulas."""

import jax.numpy as jnp
import numpy as np
import torch

from fluid_llm_tpu.train import losses, metrics


def _data(rng, shape=(2, 4, 3, 10, 8)):
    preds = rng.normal(size=shape).astype(np.float32)
    target = rng.normal(size=shape).astype(np.float32)
    mask1 = rng.random(shape[:2] + (1,) + shape[3:]) < 0.3
    # dataset repeats the mask identically across channels (simple_dataloader.py:100)
    mask = np.repeat(mask1, 3, axis=2)
    return preds, target, mask


def torch_masked_mse(p, t, m):
    sel = ~m
    pm = torch.masked_select(p, sel)
    tm = torch.masked_select(t, sel)
    return ((pm - tm) ** 2).sum() / sel.sum()


def torch_masked_mae(p, t, m):
    sel = ~m
    pm = torch.masked_select(p, sel)
    tm = torch.masked_select(t, sel)
    return (pm - tm).abs().sum() / sel.sum()


def test_mse_mae_parity(rng):
    preds, target, mask = _data(rng)
    p, t, m = torch.from_numpy(preds), torch.from_numpy(target), torch.from_numpy(mask)
    np.testing.assert_allclose(
        float(losses.mse_loss(preds, target, mask)), float(torch_masked_mse(p, t, m)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(losses.mae_loss(preds, target, mask)), float(torch_masked_mae(p, t, m)), rtol=1e-5
    )


def test_rmse_smape_mape_parity(rng):
    preds, target, mask = _data(rng)
    p, t, m = torch.from_numpy(preds), torch.from_numpy(target), torch.from_numpy(mask)
    sel = (~m).float()
    # rmse: reference zeroes masked pixels, divides by total count (losses.py:100-121)
    ref_rmse = torch.sqrt(torch.mean((t * sel - p * sel) ** 2))
    np.testing.assert_allclose(
        float(losses.rmse_loss(preds, target, mask)), float(ref_rmse), rtol=1e-5
    )
    # smape: averaged over all elements (losses.py:41-65)
    ref_smape = 2 * torch.mean((t - p).abs() / (t.abs() + p.abs() + 1e-5) * sel)
    np.testing.assert_allclose(
        float(losses.smape_loss(preds, target, mask)), float(ref_smape), rtol=1e-5
    )
    # mape (losses.py:9-38)
    pm, tm = torch.masked_select(p, ~m), torch.masked_select(t, ~m)
    ref_mape = torch.mean(((pm - tm) / tm.abs().clamp(min=1e-5)).abs().clamp(max=1.0))
    np.testing.assert_allclose(
        float(losses.mape_loss(preds, target, mask)), float(ref_mape), rtol=1e-5
    )


def test_combined_loss_matches_reference_quirk(rng):
    """The reference's 3-channel pressure mask (losses.py:178) is value-equal
    to the channel-correct mask when masks repeat across channels."""
    preds, target, mask = _data(rng)
    p, t, m = torch.from_numpy(preds), torch.from_numpy(target), torch.from_numpy(mask)

    tot, parts = losses.combined_loss(
        preds, target, mask, ["mae", "mse"], [0.1, 10.0], pressure_weight=0.1
    )

    # torch oracle with the reference's exact slicing, incl. mask[:, :, 0:]
    ref_tot = 0.0
    for fn, w in [(torch_masked_mae, 0.1), (torch_masked_mse, 10.0)]:
        loss_p = fn(p[:, :, 2:], t[:, :, 2:], m[:, :, 0:])
        loss_v = fn(p[:, :, :2], t[:, :, :2], m[:, :, :2])
        ref_tot += (loss_v + 0.1 * loss_p) * w
    np.testing.assert_allclose(float(tot), float(ref_tot), rtol=1e-5)
    assert set(parts) == {"MAE", "MSE"}


def test_calc_n_rmse_parity(rng):
    preds, target, mask = _data(rng)
    p, t, m = torch.from_numpy(preds), torch.from_numpy(target), torch.from_numpy(mask)

    def aux(p_, t_, m_):
        err = (p_ - t_) * (~m_)
        return torch.sqrt(err.pow(2).mean(dim=(-1, -2, -3)))

    ref = aux(p[:, :, :2], t[:, :, :2], m[:, :, :2]) + aux(p[:, :, 2:], t[:, :, 2:], m[:, :, 2:])
    ours = metrics.calc_n_rmse(preds, target, mask)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)


def test_normalise_states_parity(rng):
    diffs = rng.normal(size=(2, 4, 20, 3, 8, 8)).astype(np.float32)
    targs = rng.normal(size=(2, 4, 3, 32, 40)).astype(np.float32)
    preds = rng.normal(size=(2, 4, 3, 32, 40)).astype(np.float32)
    d, t, p = torch.from_numpy(diffs), torch.from_numpy(targs), torch.from_numpy(preds)

    for ci in (False, True):
        ours_t, ours_p = metrics.normalise_states(diffs, targs, preds, 0.05, ci)
        if ci:
            std = d.std(dim=(-1, -2, -4, -5), keepdim=True).squeeze(1)
        else:
            std = d.std(dim=(-1, -2, -3, -4, -5), keepdim=True).squeeze(-1)
        np.testing.assert_allclose(np.asarray(ours_t), (t / (std + 0.05)).numpy(), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_p), (p / (std + 0.05)).numpy(), rtol=1e-4)


def test_normalise_diffs_parity(rng):
    targs = rng.normal(size=(2, 4, 3, 32, 40)).astype(np.float32)
    preds = rng.normal(size=(2, 4, 3, 32, 40)).astype(np.float32)
    t, p = torch.from_numpy(targs), torch.from_numpy(preds)
    for ci in (False, True):
        ours_t, ours_p = metrics.normalise_diffs(targs, preds, 0.05, ci)
        dims = (-1, -2, -4) if ci else (-1, -2, -3, -4)
        std = t.std(dim=dims, keepdim=True)
        np.testing.assert_allclose(np.asarray(ours_t), (t / (std + 0.05)).numpy(), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_p), (p / (std + 0.05)).numpy(), rtol=1e-4)
