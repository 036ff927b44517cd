"""Independent torch oracle for the IAF + DynapCNN-discretize chain.

Every bit-accuracy claim in this repo previously rested on ONE clean-room
implementation (core/iaf.py + runtime/speck_sim.py) validated against itself
and a same-author numpy oracle.  This module is a SECOND clean-room
implementation, written in torch from the published sinabs code path —
sinabs.layers.IAF (MultiSpike activation + MembraneSubtract reset +
min_v_mem clamp) and sinabs.backend.dynapcnn.discretize
(determine_discretization_scale + the conv/spike-layer pair rule) — NOT a
port of core/iaf.py.  It is deliberately structured like the sinabs library:
a stateful per-timestep module holding `v_mem`, the spike function as a
separate callable, and the discretizer building one joint state tensor of
{v_mem, spike_threshold, min_v_mem} exactly as DynapcnnNetwork(discretize=
True) does (reference run_model.py:149-168 is the code path under test).

If core/iaf.py or speck_sim.py ever diverge from the published semantics —
a rounding rule, the reset order, the asymmetric integer range, the joint
state scale — these fuzz tests catch it against an implementation that does
not share their code or author history.
"""

import numpy as np
import pytest
import torch

from lens_tpu.core.iaf import iaf_step, iaf_step_int
from lens_tpu.core.network import LensParams
from lens_tpu.runtime.speck_sim import (
    QuantizedParams,
    discretization_scale,
    discretize,
    forward_counts_quantized,
)
from lens_tpu.core.network import SpikeThresholds

# ---------------------------------------------------------------------------
# Torch oracle #1: the sinabs IAF layer (published semantics).
#
# sinabs.layers.IAF with default activation:
#   MultiSpike:        spikes = (v_mem - thr >= 0) * trunc(v_mem / thr)
#   MembraneSubtract:  v_mem -= spikes * thr
#   min_v_mem clamp:   v_mem = clamp(v_mem, min=min_v_mem)   (after reset)
# applied per timestep after v_mem += input.
# ---------------------------------------------------------------------------


class SinabsStyleIAF:
    """Stateful IAF layer mirroring sinabs.layers.IAF's forward pass."""

    def __init__(self, spike_threshold: float, min_v_mem, shape, dtype=torch.float32):
        self.spike_threshold = spike_threshold
        self.min_v_mem = min_v_mem
        self.v_mem = torch.zeros(shape, dtype=dtype)

    def _multi_spike(self) -> torch.Tensor:
        thr = self.spike_threshold
        fires = (self.v_mem - thr >= 0).to(self.v_mem.dtype)
        if self.v_mem.dtype.is_floating_point:
            n = torch.div(self.v_mem, thr, rounding_mode="trunc")
        else:
            n = torch.div(self.v_mem, int(thr), rounding_mode="floor")
            # integer state: trunc vs floor differ only for v_mem < 0, where
            # the fires mask zeroes the result anyway
        return fires * n

    def __call__(self, x_t: torch.Tensor) -> torch.Tensor:
        self.v_mem = self.v_mem + x_t
        spikes = self._multi_spike()
        self.v_mem = self.v_mem - spikes * (
            self.spike_threshold
            if self.v_mem.dtype.is_floating_point
            else int(self.spike_threshold)
        )
        if self.min_v_mem is not None:
            self.v_mem = torch.clamp(
                self.v_mem,
                min=self.min_v_mem
                if self.v_mem.dtype.is_floating_point
                else int(self.min_v_mem),
            )
        return spikes


# ---------------------------------------------------------------------------
# Torch oracle #2: the dynapcnn discretization rule (published semantics).
#
# sinabs.backend.dynapcnn.discretize, per (conv, spiking) layer pair:
#   - weights are bounded to DYNAPCNN_WEIGHT_PRECISION_BITS = 8 signed bits,
#     neuron state (v_mem, spike_threshold, min_v_mem) to
#     DYNAPCNN_STATE_PRECISION_BITS = 16 signed bits;
#   - determine_discretization_scale(t, bits) =
#       min(|(-2^(bits-1)) / t.min()|, |(2^(bits-1)-1) / t.max()|)
#     (a zero extreme imposes no constraint);
#   - the layer scale is the min over the weight scale and the scale of ONE
#     tensor stacking the neuron state with threshold and min_v_mem;
#   - everything is multiplied by the layer scale and torch.round-ed
#     (round-half-to-even).
# ---------------------------------------------------------------------------


def sinabs_style_scale(t: torch.Tensor, bit_precision: int) -> float:
    min_val_disc = -(2 ** (bit_precision - 1))
    max_val_disc = 2 ** (bit_precision - 1) - 1
    candidates = []
    if float(t.min()) != 0.0:
        candidates.append(abs(min_val_disc / float(t.min())))
    if float(t.max()) != 0.0:
        candidates.append(abs(max_val_disc / float(t.max())))
    return min(candidates) if candidates else float("inf")


def sinabs_style_discretize_pair(
    weight: torch.Tensor, spike_threshold: float, min_v_mem: float
):
    """Returns (w_q, thr_q, minv_q, scale) for one (Linear, IAF) pair."""
    w_scale = sinabs_style_scale(weight, 8)
    # One joint state tensor: fresh v_mem (zeros) stacked with threshold and
    # min_v_mem, exactly as the library builds it before scaling.
    state = torch.cat(
        [
            torch.zeros(weight.shape[0]),  # v_mem of a fresh network
            torch.tensor([spike_threshold, min_v_mem]),
        ]
    )
    s_scale = sinabs_style_scale(state, 16)
    scale = min(w_scale, s_scale)
    if not np.isfinite(scale):
        scale = 1.0
    return (
        torch.round(weight.double() * scale),
        float(torch.round(torch.tensor(spike_threshold, dtype=torch.float64) * scale)),
        float(torch.round(torch.tensor(min_v_mem, dtype=torch.float64) * scale)),
        scale,
    )


# ---------------------------------------------------------------------------
# Fuzz: float IAF vs the sinabs-style torch layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("min_v_mem", [None, -1.0, -0.25, -37.5])
def test_float_iaf_matches_torch_oracle(seed, min_v_mem):
    """Scanned iaf_step == the torch sinabs-style IAF, elementwise exact:
    both are sequences of identical IEEE-f32 ops (add, divide, floor/trunc,
    multiply, subtract, clamp), so any divergence is a semantic difference
    (spike count rule, reset order, clamp placement), not float noise."""
    rng = np.random.default_rng(seed)
    t_steps, q, n = 50, 3, 17
    thr = float(rng.uniform(0.3, 5.0))
    # Drives include negatives, zeros, and multi-spike-magnitude bursts.
    drive = rng.normal(0.0, thr * 1.5, size=(t_steps, q, n)).astype(np.float32)
    drive[rng.random(drive.shape) < 0.1] = 0.0
    drive[0] = thr * 3.7  # guaranteed multi-spike step

    layer = SinabsStyleIAF(thr, min_v_mem, (q, n))
    torch_spikes = np.stack(
        [layer(torch.from_numpy(x)).numpy() for x in drive]
    )

    v = np.zeros((q, n), np.float32)
    ours = []
    for x in drive:
        v, s = iaf_step(v, x, thr, min_v_mem)
        ours.append(np.asarray(s))
    np.testing.assert_array_equal(np.stack(ours), torch_spikes)


def test_float_iaf_exact_threshold_ties():
    """v_mem landing exactly on k*threshold fires exactly k spikes in both
    implementations (the tie case where a >= vs > disagreement would show)."""
    thr = 0.5
    drive = np.array(
        [[1.0], [0.5], [0.25], [0.25], [-0.25], [1.5]], np.float32
    )  # v hits exactly 2*thr, thr, then accumulates to thr, ...
    layer = SinabsStyleIAF(thr, -1.0, (1,))
    torch_spikes = [float(layer(torch.from_numpy(x))) for x in drive]
    v = np.zeros((1,), np.float32)
    ours = []
    for x in drive:
        v, s = iaf_step(v, x, thr, -1.0)
        ours.append(float(np.asarray(s)[0]))
    assert ours == torch_spikes == [2.0, 1.0, 0.0, 1.0, 0.0, 2.0]


@pytest.mark.parametrize("seed", range(4))
def test_integer_iaf_matches_torch_oracle(seed):
    """iaf_step_int == the torch oracle run on int64 state (the chip's
    integer membrane dynamics after discretization)."""
    rng = np.random.default_rng(100 + seed)
    t_steps, q, n = 60, 2, 13
    thr = int(rng.integers(1, 2000))
    minv = int(-rng.integers(1, 5000))
    drive = rng.integers(-3 * thr, 4 * thr, size=(t_steps, q, n)).astype(np.int64)

    layer = SinabsStyleIAF(thr, minv, (q, n), dtype=torch.int64)
    torch_spikes = np.stack([layer(torch.from_numpy(x)).numpy() for x in drive])

    v = np.zeros((q, n), np.int32)
    ours = []
    for x in drive:
        v, s = iaf_step_int(v, x.astype(np.int32), thr, minv)
        ours.append(np.asarray(s, np.int64))
    np.testing.assert_array_equal(np.stack(ours), torch_spikes)


# ---------------------------------------------------------------------------
# Fuzz: discretization vs the sinabs-style torch rule
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_discretize_matches_torch_oracle(seed):
    """speck_sim.discretize == the torch sinabs-style pair rule on random
    models: same scales, bit-identical integer weights/thresholds/min_v.
    Domain: min_v_mem <= 0 < threshold (the only physical regime; both
    implementations include the fresh v_mem=0 in the state extremes there
    implicitly since min_v <= 0 <= thr)."""
    rng = np.random.default_rng(200 + seed)
    n_in, n_feat, n_out = 9, 14, 6
    # Mixed-sign, all-positive, all-negative and zero-padded banks.
    style = seed % 4
    if style == 0:
        wf = rng.normal(0, 1.2, (n_in, n_feat))
    elif style == 1:
        wf = np.abs(rng.normal(0, 1.2, (n_in, n_feat)))  # all-positive
    elif style == 2:
        wf = -np.abs(rng.normal(0, 1.2, (n_in, n_feat)))  # all-negative
    else:
        wf = rng.normal(0, 1.2, (n_in, n_feat))
        wf[rng.random(wf.shape) < 0.3] = 0.0
    wo = rng.normal(0, 0.8, (n_feat, n_out))
    thr_feat = float(rng.uniform(0.5, 12.0))
    thr_out = float(rng.uniform(0.5, 12.0))
    min_v = float(-rng.uniform(0.0, 4.0))

    params = LensParams(
        w_feat=wf.astype(np.float32),
        w_out=wo.astype(np.float32),
        thr_feat=np.ones(n_feat, np.float32),
        thr_out=np.ones(n_out, np.float32),
    )
    qp = discretize(params, SpikeThresholds(1.0, thr_feat, thr_out), min_v)

    for w, thr, (qw, qthr, qminv, qscale) in [
        (wf, thr_feat, (qp.w_feat, qp.thr_feat, qp.minv_feat, qp.scale_feat)),
        (wo, thr_out, (qp.w_out, qp.thr_out, qp.minv_out, qp.scale_out)),
    ]:
        ow, othr, ominv, oscale = sinabs_style_discretize_pair(
            torch.from_numpy(np.asarray(w, np.float32)), thr, min_v
        )
        assert oscale == pytest.approx(qscale, rel=1e-12)
        np.testing.assert_array_equal(np.asarray(qw), ow.numpy().astype(np.int32))
        assert int(othr) == qthr
        assert int(ominv) == qminv


def test_discretize_rounding_is_half_to_even():
    """Engineered .5 ties: both implementations round half-to-even
    (torch.round semantics), never half-away-from-zero."""
    vals = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 3.5])
    ours = np.rint(vals)  # speck_sim._round_int semantics
    theirs = torch.round(torch.from_numpy(vals)).numpy()
    np.testing.assert_array_equal(ours, theirs)
    np.testing.assert_array_equal(ours, [0.0, 2.0, 2.0, -0.0, -2.0, -2.0, 4.0])


def test_discretize_scale_asymmetric_range_vs_oracle():
    """The asymmetric signed range (a [-2, 1] bank scales by min(128/2,
    127/1) = 64) agrees between both implementations, including the
    zero-extreme = no-constraint rule."""
    w = torch.tensor([-2.0, 1.0, 0.3])
    assert sinabs_style_scale(w, 8) == discretization_scale(-2.0, 1.0, 8) == 64.0
    w_pos = torch.tensor([0.0, 4.0])  # min extreme zero: only the max binds
    assert (
        sinabs_style_scale(w_pos, 8)
        == discretization_scale(0.0, 4.0, 8)
        == 127.0 / 4.0
    )


# ---------------------------------------------------------------------------
# Full chain: float model -> discretize -> integer spiking forward
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(3))
def test_quantized_forward_chain_matches_torch_oracle(seed):
    """End-to-end cross-validation of the --simulated_speck chain: random
    float model, random binary rasters; our discretize + int32 scan must
    produce the same spike counts as the torch oracle chain (sinabs-style
    discretize + sinabs-style integer IAF layers with int64 torch matmuls).
    Different codebases, different arithmetic orders, same exact integers."""
    rng = np.random.default_rng(300 + seed)
    t_steps, q, n_in, n_feat, n_out = 40, 5, 12, 18, 7
    wf = rng.normal(0, 1.0, (n_in, n_feat)).astype(np.float32)
    wo = rng.normal(0, 0.7, (n_feat, n_out)).astype(np.float32)
    thr_feat = float(rng.uniform(0.5, 8.0))
    thr_out = float(rng.uniform(0.5, 4.0))
    min_v = -1.0
    intens = rng.uniform(0, 1, (q, n_in)).astype(np.float32)
    u = rng.uniform(0, 1, (t_steps, n_in)).astype(np.float32)
    raster = (u[:, None, :] < intens[None, :, :]).astype(np.int64)  # (T,Q,n_in)

    params = LensParams(
        w_feat=wf, w_out=wo,
        thr_feat=np.ones(n_feat, np.float32), thr_out=np.ones(n_out, np.float32),
    )
    qp = discretize(params, SpikeThresholds(1.0, thr_feat, thr_out), min_v)
    ours = np.asarray(
        forward_counts_quantized(qp, intens, u)
    )

    # Torch oracle chain (int64 throughout).
    owf, othr_f, ominv_f, _ = sinabs_style_discretize_pair(
        torch.from_numpy(wf), thr_feat, min_v
    )
    owo, othr_o, ominv_o, _ = sinabs_style_discretize_pair(
        torch.from_numpy(wo), thr_out, min_v
    )
    feat = SinabsStyleIAF(othr_f, ominv_f, (q, n_feat), dtype=torch.int64)
    out = SinabsStyleIAF(othr_o, ominv_o, (q, n_out), dtype=torch.int64)
    counts = torch.zeros((q, n_out), dtype=torch.int64)
    owf_i = owf.to(torch.int64)
    owo_i = owo.to(torch.int64)
    for x_t in raster:
        s2 = feat(torch.from_numpy(x_t) @ owf_i)
        s3 = out(s2 @ owo_i)
        counts += s3
    np.testing.assert_array_equal(ours, counts.numpy().astype(np.int32))


def test_quantized_chain_oracle_on_bundled_model():
    """The bundled example checkpoint through both chains on a short raster:
    guards the shipped parity claim itself, not just random models."""
    from lens_tpu.utils import checkpoint

    params = checkpoint.load_model(
        "lens/models", "example-reference_LENS_IN100_FN200_DB100.pth"
    )
    rng = np.random.default_rng(9)
    q, t_steps = 4, 30
    intens = rng.uniform(0, 1, (q, 100)).astype(np.float32)
    u = rng.uniform(0, 1, (t_steps, 100)).astype(np.float32)
    raster = (u[:, None, :] < intens[None, :, :]).astype(np.int64)

    qp = discretize(params, SpikeThresholds(), -1.0)
    ours = np.asarray(forward_counts_quantized(qp, intens, u))

    wf = np.array(params.w_feat, np.float32)  # writable copies for torch
    wo = np.array(params.w_out, np.float32)
    owf, othr_f, ominv_f, _ = sinabs_style_discretize_pair(
        torch.from_numpy(wf), 1.0, -1.0
    )
    owo, othr_o, ominv_o, _ = sinabs_style_discretize_pair(
        torch.from_numpy(wo), 1.0, -1.0
    )
    feat = SinabsStyleIAF(othr_f, ominv_f, (q, wf.shape[1]), dtype=torch.int64)
    out = SinabsStyleIAF(othr_o, ominv_o, (q, wo.shape[1]), dtype=torch.int64)
    counts = torch.zeros((q, wo.shape[1]), dtype=torch.int64)
    for x_t in raster:
        s2 = feat(torch.from_numpy(x_t) @ owf.to(torch.int64))
        s3 = out(s2 @ owo.to(torch.int64))
        counts += s3
    assert counts.sum() > 0  # non-degenerate
    np.testing.assert_array_equal(ours, counts.numpy().astype(np.int32))
