"""ConvRNN parity vs the reference torch cells/encoder with mapped weights.

Covers the recurrence math of the third model family: ConvGRU (including our
fused reset|update gate convolution vs the reference's two separate convs),
ConvLSTM gate ordering, and the full three-scale encoder over a multi-frame
window.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)
torch = pytest.importorskip("torch")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _conv2d_w(t):  # torch (O, I, kh, kw) → flax (kh, kw, I, O)
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def _to_nhwc(x):  # (B, C, H, W) → (B, H, W, C)
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _map_gru(ref):
    return {
        "gates": {
            "kernel": jnp.concatenate(
                [_conv2d_w(ref.reset_gate.weight),
                 _conv2d_w(ref.update_gate.weight)], axis=-1
            ),
            "bias": jnp.concatenate([
                jnp.asarray(ref.reset_gate.bias.detach().numpy()),
                jnp.asarray(ref.update_gate.bias.detach().numpy()),
            ]),
        },
        "candidate": {
            "kernel": _conv2d_w(ref.conv_cand.weight),
            "bias": jnp.asarray(ref.conv_cand.bias.detach().numpy()),
        },
    }


def test_gru_cell_parity():
    from models.convRNN.convGRUCell import ConvGRUCell as RefGRU

    from crowdmod_tpu.models.convrnn.cells import ConvGRUCell, init_state

    torch.manual_seed(0)
    b, ci, ch, h, w = 2, 4, 8, 6, 10
    ref = RefGRU(input_size=(h, w), input_dim=ci, hidden_dim=ch,
                 kernel_size=3, bias=True).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, ci, h, w)).astype(np.float32)
    h_prev = rng.normal(size=(b, ch, h, w)).astype(np.float32)
    with torch.no_grad():
        h_ref, _ = ref(torch.tensor(x), (torch.tensor(h_prev), None))

    cell = ConvGRUCell(hidden_channels=ch, kernel_size=3, use_bias=True)
    params = {"params": _map_gru(ref)}
    state = (_to_nhwc(h_prev), init_state(b, h, w, ch)[1])
    out, _ = cell.apply(params, _to_nhwc(x), state)
    np.testing.assert_allclose(_from_nhwc(out), h_ref.numpy(), atol=1e-5)


def test_lstm_cell_parity():
    from models.convRNN.convLSTMCell import ConvLSTMCell as RefLSTM

    from crowdmod_tpu.models.convrnn.cells import ConvLSTMCell

    torch.manual_seed(0)
    b, ci, ch, h, w = 2, 4, 8, 6, 10
    ref = RefLSTM(input_size=(h, w), input_dim=ci, hidden_dim=ch,
                  kernel_size=3, bias=True).eval()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, ci, h, w)).astype(np.float32)
    h_prev = rng.normal(size=(b, ch, h, w)).astype(np.float32)
    c_prev = rng.normal(size=(b, ch, h, w)).astype(np.float32)
    with torch.no_grad():
        h_ref, c_ref = ref(torch.tensor(x),
                           (torch.tensor(h_prev), torch.tensor(c_prev)))

    cell = ConvLSTMCell(hidden_channels=ch, kernel_size=3, use_bias=True)
    params = {"params": {"gates": {
        "kernel": _conv2d_w(ref.conv.weight),
        "bias": jnp.asarray(ref.conv.bias.detach().numpy()),
    }}}
    out, (h_new, c_new) = cell.apply(
        params, _to_nhwc(x), (_to_nhwc(h_prev), _to_nhwc(c_prev))
    )
    np.testing.assert_allclose(_from_nhwc(out), h_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(c_new), c_ref.numpy(), atol=1e-5)


def test_encoder_parity():
    """Three-scale recurrent encoder over a full 5-frame window."""
    from models.convRNN.convGRUCell import ConvGRUCell as RefGRU
    from models.convRNN.encoder import Encoder as RefEncoder

    from crowdmod_tpu.models.convrnn.cells import ConvGRUCell, init_state
    from crowdmod_tpu.models.convrnn.forecaster import Encoder

    torch.manual_seed(0)
    b, ci, h, w, t = 2, 4, 8, 12, 5
    hidden = [8, 16, 16, 24, 24, 24]
    kernels = [3] * 6
    ref = RefEncoder(
        input_size=(h, w), input_channels=ci, hidden_channels=hidden,
        enc_kernels=kernels, num_layers=6, device="cpu",
        cell_class=RefGRU, bias=True,
    ).eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(b, ci, h, w, t)).astype(np.float32)
    # Reference hidden-state list: index 2 = full res, 1 = half, 0 = quarter.
    ref_state = [
        (torch.zeros(b, hidden[5], h // 4, w // 4), None),
        (torch.zeros(b, hidden[3], h // 2, w // 2), None),
        (torch.zeros(b, hidden[1], h, w), None),
    ]
    with torch.no_grad():
        top_ref, _ = ref(torch.tensor(x), ref_state)

    ours = Encoder(
        hidden_channels=tuple(hidden), kernels=tuple(kernels),
        cell=ConvGRUCell, use_bias=True,
    )
    lst = ref.encoder_cell_list
    params = {"params": {
        "conv1": {"kernel": _conv2d_w(lst[0].weight),
                  "bias": jnp.asarray(lst[0].bias.detach().numpy())},
        "rnn1": _map_gru(lst[1]),
        "down1": {"kernel": _conv2d_w(lst[2].weight),
                  "bias": jnp.asarray(lst[2].bias.detach().numpy())},
        "rnn2": _map_gru(lst[3]),
        "down2": {"kernel": _conv2d_w(lst[4].weight),
                  "bias": jnp.asarray(lst[4].bias.detach().numpy())},
        "rnn3": _map_gru(lst[5]),
    }}
    state = [
        init_state(b, h // 4, w // 4, hidden[5]),
        init_state(b, h // 2, w // 2, hidden[3]),
        init_state(b, h, w, hidden[1]),
    ]
    window = jnp.asarray(np.transpose(x, (0, 4, 2, 3, 1)))  # (B, T, H, W, C)
    top, _ = ours.apply(params, window, state)
    np.testing.assert_allclose(
        _from_nhwc(top), top_ref.numpy(), atol=1e-4,
        err_msg="Encoder diverges from reference over a 5-frame window",
    )
