"""Reduced-depth evaluation of conv stacks on depth-banded volumes.

The DfM mono branch's input volume is depth-constant outside a narrow
edge band (ops/band_volume.py). Any conv stack applied to it therefore
produces an output that is (a) equal near the edges to the output on a
shorter volume with the same edges, and (b) periodic in the interior
(period = product of the stack's transposed-conv strides). So the
whole mono hourglass + depth-pred stack can be evaluated EXACTLY on a
reduced volume of Dr = 2*(E + M + 2) + P slices — bottom edge, one
canonical period, top edge — and expanded back by index-tiling, where
M bounds the stack's half receptive field and P its output period.

The one non-local op is GroupNorm: its statistics couple every slice.
Exactness is preserved by weighting each reduced slice's moments with
its multiplicity (how many full-volume slices it stands for): bottom
and top slices count once, each canonical-period slice counts
(D - 2*bot)/P times. The weighted stats equal the full-volume stats
bit-for-bit in f32 accumulation, so the normalized activations match
everywhere (models/backbones/dfm_backbone.py RedConvNorm).
"""

import numpy as np

__all__ = ['ReducedPlan', 'make_reduced_plan']


class ReducedPlan:
    """Index maps + per-scale GN multiplicities for a reduced volume.

    Attributes:
        d, dr: full / reduced depth.
        bot: bottom (= top) edge length in the reduced volume.
        period: interior period P of the stack output.
        expand_idx: (D,) int — full[d] = reduced[expand_idx[d]].
        mult(scale): (Dr/2**scale,) f32 multiplicity vector for GN at
            that downsampling scale.
    """

    def __init__(self, d, e, m, period):
        bot = e + m + 2
        dr = 2 * bot + period
        if dr >= d or d % period or bot % period:
            raise ValueError(f'no reduction: D={d} Dr={dr}')
        self.d, self.dr, self.bot, self.period = d, dr, bot, period
        delta = d - dr
        if delta % period:
            raise ValueError('shift not period-aligned')
        mid_end = d - bot - period   # full middle region = [bot, d-bot)
        idx = np.empty(d, np.int32)
        for dd in range(d):
            if dd < bot:
                idx[dd] = dd
            elif dd < d - bot - period:
                idx[dd] = bot + (dd - bot) % period
            else:
                idx[dd] = dd - delta
        del mid_end
        self.expand_idx = idx
        # every reduced slice is used; canonical period reps:
        self.mid_mult = (d - 2 * bot) // period

    def mult(self, scale):
        f = 2 ** scale
        bot, p = self.bot // f, max(self.period // f, 1)
        m = np.ones(self.dr // f if self.dr % f == 0 else
                    (self.dr - 1) // f + 1, np.float32)
        # middle multiplicity is scale-invariant: (D-2*bot)/P full
        # slices collapse onto P canonical ones at every scale
        m[bot:bot + p] = self.mid_mult
        return m


def make_reduced_plan(d, e=2, m=16, period=4):
    """Plan for the DfM mono stack (hourglass + pred: half-RF 15 < 16,
    two z-transposed convs -> period 4). Returns None when the volume
    is too short to profit (callers fall back to dense)."""
    try:
        return ReducedPlan(d, e, m, period)
    except ValueError:
        return None
