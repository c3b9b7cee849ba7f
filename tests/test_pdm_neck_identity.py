"""PDMNeck (point form) vs PDMNeckConv (grid form): the documented identity.

VERDICT r1 weak-item 2 asked for evidence that the conv recast computes the
same operation as the point-form neck. The claim (pdm_neck_conv.py docstring):
for dilation centers ON grid-cell centers,

    scatter:  out(p) = sum_c gauss(p-c) * Y(p-c)^T coeffs(c)
    conv:     out    = conv(scatter(coeffs), K),  K[o] = gauss(o) * Y(o)

These tests verify the identity numerically: the point-form accumulation
(computed with the point module's own basis/gaussian functions) equals a
convolution with `sh_gaussian_kernel_init` over the scattered coefficients —
including overlapping centers — and quantization is the ONLY deviation
(off-center points change the result, bounded here).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.models.backbones_2d.pdm_neck import solid_harmonics_deg2
from pdm_ssd_tpu.models.backbones_2d.pdm_neck_conv import sh_gaussian_kernel_init


def _point_form_grid(centers_cells, coeffs, H, W, win, sigma):
    """Point-form accumulation at z=0 for centers on cell centers.
    centers_cells: (M, 2) int (cx, cy); coeffs: (M, 9, C)."""
    M, _, C = coeffs.shape
    out = np.zeros((H, W, C), np.float64)
    r = win // 2
    for m in range(M):
        cx, cy = centers_cells[m]
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                px, py = cx + dx, cy + dy
                if not (0 <= px < W and 0 <= py < H):
                    continue
                o = np.array([dx, dy, 0.0]) / sigma
                g = np.exp(-0.5 * np.sum(o * o))
                basis = np.asarray(solid_harmonics_deg2(jnp.asarray(o)))
                out[py, px] += g * basis @ coeffs[m]
    return out


def test_scatter_equals_conv_on_cell_centers():
    rng = np.random.RandomState(0)
    H, W, C, M, win, sigma = 12, 14, 3, 6, 5, 1.2
    cells = np.stack([rng.randint(2, W - 2, M), rng.randint(2, H - 2, M)], -1)
    cells[1] = cells[0]  # overlapping centers must ADD, like the scatter
    coeffs = rng.randn(M, 9, C)

    want = _point_form_grid(cells, coeffs, H, W, win, sigma)

    # conv form: scatter coefficients to their cells, convolve with the
    # analytic kernel (z collapsed: Dz=1, z offset 0)
    K = sh_gaussian_kernel_init(win, 9, 1, sigma, z_extent=0.0)  # (w,w,9,1)
    grid = np.zeros((H, W, 9, C), np.float64)
    for m in range(M):
        cx, cy = cells[m]
        grid[cy, cx] += coeffs[m]
    # correlation-style conv with SAME padding (flax nn.Conv semantics)
    got = np.zeros((H, W, C), np.float64)
    r = win // 2
    for iy in range(win):
        for ix in range(win):
            sy, sx = iy - r, ix - r
            shifted = np.roll(np.roll(grid, sy, axis=0), sx, axis=1)
            # zero the wrapped borders
            if sy > 0:
                shifted[:sy] = 0
            elif sy < 0:
                shifted[sy:] = 0
            if sx > 0:
                shifted[:, :sx] = 0
            elif sx < 0:
                shifted[:, sx:] = 0
            got += np.einsum('hwsc,s->hwc', shifted, K[iy, ix, :, 0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_quantization_is_the_only_deviation():
    """Off-center points: the conv form (centers snapped to cells) deviates
    by an amount that vanishes as the point approaches the cell center."""
    H, W, C, win, sigma = 12, 14, 1, 5, 1.2
    coeffs = np.ones((1, 9, C))
    errs = []
    for frac in (0.0, 0.1, 0.3):
        # exact point-form at continuous offset `frac` from the cell center
        out_exact = np.zeros((H, W, C))
        r = win // 2
        cx, cy = 7, 6
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                o = np.array([dx - frac, dy, 0.0]) / sigma
                g = np.exp(-0.5 * np.sum(o * o))
                basis = np.asarray(solid_harmonics_deg2(jnp.asarray(o)))
                out_exact[cy + dy, cx + dx] += g * basis @ coeffs[0]
        out_snapped = _point_form_grid(np.array([[cx, cy]]), coeffs, H, W,
                                       win, sigma)
        errs.append(np.abs(out_exact - out_snapped).max())
    assert errs[0] < 1e-9                 # on-center: identical
    assert errs[1] < errs[2]              # error grows with the offset
    assert errs[2] < 1.1                  # bounded (unit coeffs, g <= 1)
