"""Parity tests: our GRU/LSTM cells and packed-sequence bi-LSTM must match
torch's (the reference's RNNs are torch; checkpoint parity requires
bit-level recurrence equivalence, SURVEY.md hard part #2)."""

import numpy as np
import torch

from ivlnce_tpu.models import rnn as R


def torch_gru_params(tg):
    return {
        "w_ih": tg.weight_ih_l0.detach().numpy(),
        "w_hh": tg.weight_hh_l0.detach().numpy(),
        "b_ih": tg.bias_ih_l0.detach().numpy(),
        "b_hh": tg.bias_hh_l0.detach().numpy(),
    }


def test_gru_cell_matches_torch(rng):
    torch.manual_seed(0)
    I, H, B, T = 12, 16, 4, 7
    tg = torch.nn.GRU(I, H)
    p = torch_gru_params(tg)

    xs = rng.normal(size=(T, B, I)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)

    with torch.no_grad():
        t_out, t_h = tg(torch.from_numpy(xs), torch.from_numpy(h0)[None])

    ys, h_t = R.gru_sequence(p, xs, h0, np.ones((T, B), np.float32))
    np.testing.assert_allclose(
        np.asarray(ys), t_out.numpy(), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(h_t), t_h[0].numpy(), atol=5e-5, rtol=1e-4
    )


def test_gru_mask_resets_recurrence(rng):
    I, H, B, T = 4, 8, 2, 6
    torch.manual_seed(1)
    tg = torch.nn.GRU(I, H)
    p = torch_gru_params(tg)
    xs = rng.normal(size=(T, B, I)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    masks = np.ones((T, B), np.float32)
    masks[3, 0] = 0.0  # lane 0 restarts at t=3

    ys, _ = R.gru_sequence(p, xs, h0, masks)
    # lane 0 from t=3 equals running from zero state
    ys2, _ = R.gru_sequence(
        p, xs[3:], np.zeros((B, H), np.float32), np.ones((T - 3, B), np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(ys)[3:, 0], np.asarray(ys2)[:, 0], atol=1e-6
    )
    # lane 1 is unaffected vs no-mask run
    ys3, _ = R.gru_sequence(p, xs, h0, np.ones((T, B), np.float32))
    np.testing.assert_allclose(
        np.asarray(ys)[:, 1], np.asarray(ys3)[:, 1], atol=1e-6
    )


def test_bi_lstm_matches_torch_packed(rng):
    torch.manual_seed(2)
    I, H, B, T = 10, 13, 5, 9
    tl = torch.nn.LSTM(I, H, bidirectional=True)
    p_fwd = {
        "w_ih": tl.weight_ih_l0.detach().numpy(),
        "w_hh": tl.weight_hh_l0.detach().numpy(),
        "b_ih": tl.bias_ih_l0.detach().numpy(),
        "b_hh": tl.bias_hh_l0.detach().numpy(),
    }
    p_bwd = {
        "w_ih": tl.weight_ih_l0_reverse.detach().numpy(),
        "w_hh": tl.weight_hh_l0_reverse.detach().numpy(),
        "b_ih": tl.bias_ih_l0_reverse.detach().numpy(),
        "b_hh": tl.bias_hh_l0_reverse.detach().numpy(),
    }

    lengths = np.array([9, 3, 1, 7, 5], np.int64)
    xs = rng.normal(size=(B, T, I)).astype(np.float32)
    # zero out padding like tokenized instructions are
    for b, L in enumerate(lengths):
        xs[b, L:] = 0.0

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(xs),
        torch.from_numpy(lengths),
        batch_first=True,
        enforce_sorted=False,
    )
    with torch.no_grad():
        t_out_packed, (t_h, _) = tl(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        t_out_packed, batch_first=True, total_length=T
    )
    # torch final_state: (2, B, H) [fwd, bwd]
    t_final = torch.cat([t_h[0], t_h[1]], dim=-1)

    ours, final = R.bi_lstm_padded(p_fwd, p_bwd, xs, lengths.astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(ours), t_out.numpy(), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(final), t_final.numpy(), atol=5e-5, rtol=1e-4
    )
