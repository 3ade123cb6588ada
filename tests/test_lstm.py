"""Masked biLSTM parity against torch.nn.LSTM with packed sequences.

torch (CPU) serves as the numerical oracle for the reference's
pack/pad + biLSTM semantics (reference models.py:38-64).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from video_moment_localization_tpu.models.lstm import bilstm  # noqa: E402


def _torch_bilstm_packed(x, lengths, lstm, total_length):
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    out, _ = lstm(packed)
    padded, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=total_length
    )
    return padded.detach().numpy()


def _port_lstm_params(lstm, num_layers):
    layers = []
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    for layer in range(num_layers):
        directions = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            directions[direction] = {
                "w_ih": jnp.asarray(sd[f"weight_ih_l{layer}{suffix}"]),
                "w_hh": jnp.asarray(sd[f"weight_hh_l{layer}{suffix}"]),
                "b_ih": jnp.asarray(sd[f"bias_ih_l{layer}{suffix}"]),
                "b_hh": jnp.asarray(sd[f"bias_hh_l{layer}{suffix}"]),
            }
        layers.append(directions)
    return layers


@pytest.mark.parametrize("num_layers", [1, 2])
def test_bilstm_matches_torch_packed(num_layers):
    torch.manual_seed(0)
    B, S, IN, H = 5, 9, 7, 6
    lengths = [9, 3, 1, 6, 9]  # unsorted, with full-length and length-1 cases
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, S, IN)).astype(np.float32)
    # zero out padding in the input (as the dataset's pad embedding does)
    for b, l in enumerate(lengths):
        x[b, l:] = 0.0

    lstm = torch.nn.LSTM(IN, H, num_layers=num_layers, bidirectional=True, batch_first=True)
    ref = _torch_bilstm_packed(x, lengths, lstm, S)

    mask = np.zeros((B, S), np.float32)
    for b, l in enumerate(lengths):
        mask[b, :l] = 1.0
    ours = np.asarray(bilstm(jnp.asarray(x), jnp.asarray(mask), _port_lstm_params(lstm, num_layers)))

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_bilstm_sentence_feature_gather():
    """fs = [forward at t=len-1, backward at t=0] matches torch final states."""
    torch.manual_seed(1)
    B, S, IN, H = 4, 6, 5, 3
    lengths = [6, 2, 4, 1]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, S, IN)).astype(np.float32)
    for b, l in enumerate(lengths):
        x[b, l:] = 0.0

    lstm = torch.nn.LSTM(IN, H, num_layers=2, bidirectional=True, batch_first=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    _, (h_n, _) = lstm(packed)
    # h_n: (num_layers*2, B, H); last layer fwd = index -2, bwd = index -1
    fs_ref = torch.cat([h_n[-2], h_n[-1]], dim=1).detach().numpy()

    mask = np.zeros((B, S), np.float32)
    for b, l in enumerate(lengths):
        mask[b, :l] = 1.0
    fw = np.asarray(bilstm(jnp.asarray(x), jnp.asarray(mask), _port_lstm_params(lstm, 2)))
    idx = np.asarray(lengths) - 1
    fs_ours = np.concatenate(
        [fw[np.arange(B), idx, :H], fw[:, 0, H:]], axis=1
    )
    np.testing.assert_allclose(fs_ours, fs_ref, rtol=1e-5, atol=1e-5)
