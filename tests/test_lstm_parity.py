"""ops.lstm vs torch.nn.LSTM golden parity (gate order, bias sum, stacking,
bidirectional concat, final-state layout)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from pathtracker_tpu.ops.lstm import lstm_apply, lstm_params  # noqa: E402

T, B, D, H = 5, 3, 4, 6


class _Holder(nn.Module):
    num_layers: int = 2
    bidirectional: bool = True

    @nn.compact
    def __call__(self, seq):
        p = lstm_params(self, "lstm", D, H, self.num_layers, self.bidirectional)
        return lstm_apply(p, seq)


@pytest.mark.parametrize("num_layers,bidirectional", [(1, False), (2, True)])
def test_lstm_matches_torch(num_layers, bidirectional):
    rng = np.random.default_rng(0)
    seq = rng.standard_normal((T, B, D)).astype(np.float32)

    holder = _Holder(num_layers=num_layers, bidirectional=bidirectional)
    variables = holder.init(jax.random.key(0), jnp.asarray(seq))
    out, (h_n, c_n) = holder.apply(variables, jnp.asarray(seq))

    ref = torch.nn.LSTM(D, H, num_layers=num_layers,
                        bidirectional=bidirectional)
    dirs = 2 if bidirectional else 1
    with torch.no_grad():
        for layer in range(num_layers):
            for d in range(dirs):
                sfx = f"lstm_l{layer}" + ("_rev" if d else "")
                tsfx = f"l{layer}" + ("_reverse" if d else "")
                p = variables["params"]
                getattr(ref, f"weight_ih_{tsfx}").copy_(
                    torch.from_numpy(np.asarray(p[f"{sfx}_w_ih"]).T))
                getattr(ref, f"weight_hh_{tsfx}").copy_(
                    torch.from_numpy(np.asarray(p[f"{sfx}_w_hh"]).T))
                getattr(ref, f"bias_ih_{tsfx}").copy_(
                    torch.from_numpy(np.asarray(p[f"{sfx}_b_ih"])))
                getattr(ref, f"bias_hh_{tsfx}").copy_(
                    torch.from_numpy(np.asarray(p[f"{sfx}_b_hh"])))
        tout, (th, tc) = ref(torch.from_numpy(seq))

    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_n), th.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_n), tc.numpy(), atol=2e-5)


def test_slowfast_pathway_split_matches_torch_semantics():
    """engine.slowfast_pathways must reproduce torch.index_select on
    linspace(0, T-1, T//alpha).long() (reference utils/engine.py:52-60)."""
    from pathtracker_tpu import engine

    t = 64
    x = jnp.asarray(np.arange(2 * 3 * t * 4 * 4, dtype=np.float32)
                    .reshape(2, 3, t, 4, 4))
    slow, fast = engine.slowfast_pathways(x)
    idx = torch.linspace(0, t - 1, t // 4).long().numpy()
    np.testing.assert_array_equal(np.asarray(slow),
                                  np.asarray(x)[:, :, idx])
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(x))
