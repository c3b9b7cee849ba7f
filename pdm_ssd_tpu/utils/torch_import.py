"""Reference (torch) checkpoint -> flax params importer.

Generalizes the weight-porting logic of the parity test family into a
name-mapping importer for real reference checkpoints: a flat
`state_dict` {dotted name: array} is translated rule-by-rule into this
framework's param/batch_stats trees. Layout transforms:

- Linear:             torch (out, in)            -> flax (in, out)
- Conv2d:             torch (out, in, kh, kw)    -> flax (kh, kw, in, out)
- ConvTranspose2d:    torch (in, out, kh, kw)    -> flax (kh, kw, in, out)
  with a spatial flip (flax's conv_transpose is a fractionally strided
  correlation, torch's is the gradient of Conv2d)
- sparse 3D conv:     any of the spconv weight layouts -> the gather-matmul
  (K*in, out) kernel with z-outer/x-inner tap order
  (`ops/sparse_maps._subm_map`); layout detection mirrors the reference's
  own version-migration transposition
  (`pcdet/models/detectors/detector3d_template.py:330-359`).

Slot subtrees (vfe / backbone_2d / backbone_3d / dense_head) are located in
the target tree by marker keys instead of hard-coded module indices, so the
mapping survives differing detector assemblies. Unmatched source keys and
untouched target leaves are reported, mirroring the reference loader's
"Not updated weight" logging.
"""
from __future__ import annotations

import re

import numpy as np


# ---------------- layout transforms ----------------

def linear_w(w):
    return np.asarray(w).T


def conv2d_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def deconv2d_w(w):
    return np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def spconv_w(w, tgt_shape, flipped=False):
    """Any spconv weight layout -> the (K*c_in, c_out) gather-matmul kernel
    with z-outer/x-inner tap order (`ops/sparse_maps._subm_map`).

    `tgt_shape` is the target kernel's (K*c_in, c_out). Candidate source
    layouts are tried in the order the reference's own version-migration
    code does (`detector3d_template.py:330-359`):
      (out, in, kz, ky, kx)  torch dense-conv layout (the parity shims)
      (kz, ky, kx, in, out)  spconv 1.x native
      (out, kz, ky, kx, in)  spconv 2.x native
    `flipped` reverses the taps (inverse convs consume flip-stored maps).
    """
    w = np.asarray(w)
    assert w.ndim == 5, w.shape
    K_cin, c_out = tgt_shape
    if w.size != K_cin * c_out:
        raise ValueError(f'size mismatch: {w.shape} vs target {tgt_shape}')
    s = w.shape
    candidates = [
        ((2, 3, 4, 1, 0), s[1], s[0], (2, 3, 4)),  # dense (out,in,kz,ky,kx)
        (None, s[3], s[4], (0, 1, 2)),        # spconv 1.x (kz,ky,kx,in,out)
        ((1, 2, 3, 4, 0), s[4], s[0], (1, 2, 3)),  # 2.x (out,kz,ky,kx,in)
    ]
    for perm, ci, co, kaxes in candidates:
        K = w.size // max(ci * co, 1)
        # the kernel axes must look like kernel sizes (<= 7), else a channel
        # dim is being mistaken for a tap dim (e.g. 2.x vs dense ambiguity)
        if any(s[a] > 7 for a in kaxes):
            continue
        if co == c_out and K * ci == K_cin:
            out = w if perm is None else np.transpose(w, perm)
            if flipped:
                out = out[::-1, ::-1, ::-1]
            return np.ascontiguousarray(out).reshape(K * ci, co)
    raise ValueError(f'unrecognized spconv layout {s} for target {tgt_shape}')


# ---------------- tree helpers ----------------

def _find_subtree(tree, marker, _path=()):
    """Depth-first search for the subtree containing key `marker`."""
    if not isinstance(tree, dict):
        return None
    if marker in tree:
        return _path
    for k, v in tree.items():
        hit = _find_subtree(v, marker, _path + (k,))
        if hit is not None:
            return hit
    return None


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    cur = tree.get(path[-1])
    if cur is not None and np.shape(cur) != np.shape(value):
        raise ValueError(f'shape mismatch at {"/".join(path)}: '
                         f'{np.shape(cur)} vs {np.shape(value)}')
    tree[path[-1]] = np.asarray(value, np.float32)


_BN_MAP = {'weight': ('params', 'scale'), 'bias': ('params', 'bias'),
           'running_mean': ('stats', 'mean'), 'running_var': ('stats', 'var')}


class _Importer:
    def __init__(self, params, stats):
        self.params = params
        self.stats = stats
        self.loaded, self.unmatched = [], []

    def slot(self, marker):
        return _find_subtree(self.params, marker)

    def put(self, kind, path, value):
        _set(self.params if kind == 'params' else self.stats, path, value)

    def bn(self, base_path, field, value):
        kind, leaf = _BN_MAP[field]
        self.put(kind, base_path + (leaf,), value)


def _rules(imp: _Importer):
    """(regex, handler) rules over reference state_dict names. Handlers
    raise KeyError/ValueError on non-applicable entries (-> unmatched)."""
    vfe = imp.slot('pfn_0')
    bev = imp.slot('down0_conv0')
    head = imp.slot('conv_cls')
    sp3d = imp.slot('conv_input')

    def pfn(m, name, v):
        i, leaf, field = m.group(1), m.group(2), m.group(3)
        base = vfe + ((f'pfn_{i}',) if leaf == 'linear'
                      else (f'pfn_bn_{i}',))
        if leaf == 'linear':
            imp.put('params', base + ('kernel',), linear_w(v))
        else:
            imp.bn(base, field, v)

    def bev_block(m, name, v):
        i, j, field = int(m.group(1)), int(m.group(2)), m.group(3)
        # Sequential [ZeroPad, (Conv, BN, ReLU) * n]: conv k at 1+3k, bn at
        # 2+3k (reference `base_bev_backbone.py:28-48`)
        if (j - 1) % 3 == 0 and field == 'weight':
            k = (j - 1) // 3
            imp.put('params', bev + (f'down{i}_conv{k}', 'kernel'),
                    conv2d_w(v))
        elif (j - 2) % 3 == 0:
            k = (j - 2) // 3
            imp.bn(bev + (f'down{i}_bn{k}',), field, v)
        else:
            raise KeyError(name)

    def bev_deblock(m, name, v):
        i, j, field = int(m.group(1)), int(m.group(2)), m.group(3)
        tgt = _get(imp.params, bev)
        if j == 0 and field == 'weight':
            if f'up{i}_deconv' in tgt:
                imp.put('params', bev + (f'up{i}_deconv', 'kernel'),
                        deconv2d_w(v))
            else:
                imp.put('params', bev + (f'up{i}_conv', 'kernel'),
                        conv2d_w(v))
        elif j == 1:
            imp.bn(bev + (f'up{i}_bn',), field, v)
        else:
            raise KeyError(name)

    def head_conv(m, name, v):
        leaf, field = m.group(1), m.group(2)
        path = head + (leaf, field if field == 'bias' else 'kernel')
        imp.put('params', path, conv2d_w(v) if field == 'weight' else v)

    def _sp_target(ref_block, k):
        """reference spconv layer name -> our sparse-backbone leaf name."""
        if ref_block in ('conv_input', 'conv_out'):
            return ref_block if k == 0 else None
        s = ref_block[-1]
        if ref_block == 'conv1':
            return 'conv1_subm0' if k == 0 else None
        return f'down{s}' if k == 0 else f'conv{s}_subm{k - 1}'

    def sp_conv(m, name, v):
        if sp3d is None:
            raise KeyError(name)
        block, k, j, field = (m.group(1), int(m.group(2) or 0),
                              int(m.group(3)), m.group(4))
        leaf = _sp_target(block, k)
        if leaf is None:
            raise KeyError(name)
        base = sp3d + (leaf,)
        if j == 0 and field == 'weight':      # the sparse conv itself
            tgt = _get(imp.params, base)['kernel']
            imp.put('params', base + ('kernel',),
                    spconv_w(v, tuple(tgt.shape)))
        elif j == 1:                          # the BN that follows
            imp.bn(base + ('MaskedBatchNorm_0',), field, v)
        else:
            raise KeyError(name)

    swin = imp.slot('patch_embed')
    neck = imp.slot('lateral_0')

    def _ln(base, field, v):
        imp.put('params',
                base + ('scale' if field == 'weight' else 'bias',), v)

    def swin_patch(m, name, v):
        leaf, field = m.group(1), m.group(2)
        if leaf == 'projection':
            path = swin + ('patch_embed',
                           'kernel' if field == 'weight' else 'bias')
            imp.put('params', path, conv2d_w(v) if field == 'weight' else v)
        else:
            _ln(swin + ('patch_ln',), field, v)

    def _merge_perm(c):
        """reference PatchMerging unfolds channel-major (c*4 + ih*2 + iw);
        our 2x2 concat is spatial-major (ih*2C + iw*C + c)."""
        idx = np.empty(4 * c, np.int64)
        for ih in range(2):
            for iw in range(2):
                for cc in range(c):
                    idx[ih * 2 * c + iw * c + cc] = cc * 4 + ih * 2 + iw
        return idx

    def swin_block(m, name, v):
        si, bi, rest, field = (m.group(1), m.group(2), m.group(3),
                               m.group(4))
        base = swin + (f's{si}_b{bi}',)
        if rest == 'norm1':
            _ln(base + ('ln1',), field, v)
        elif rest == 'norm2':
            _ln(base + ('ln2',), field, v)
        elif rest == 'attn.w_msa.qkv':
            imp.put('params', base + ('attn', 'qkv',
                                      'kernel' if field == 'weight'
                                      else 'bias'),
                    linear_w(v) if field == 'weight' else v)
        elif rest == 'attn.w_msa.proj':
            imp.put('params', base + ('attn', 'proj',
                                      'kernel' if field == 'weight'
                                      else 'bias'),
                    linear_w(v) if field == 'weight' else v)
        elif rest == 'attn.w_msa' and field == \
                'relative_position_bias_table':
            imp.put('params', base + ('attn', 'rel_bias'), v)
        elif rest == 'attn.w_msa' and field == 'relative_position_index':
            pass    # buffer; our index is rebuilt from the window size
        elif rest == 'ffn.layers.0.0':
            imp.put('params', base + ('mlp1', 'kernel' if field == 'weight'
                                      else 'bias'),
                    linear_w(v) if field == 'weight' else v)
        elif rest == 'ffn.layers.1':
            imp.put('params', base + ('mlp2', 'kernel' if field == 'weight'
                                      else 'bias'),
                    linear_w(v) if field == 'weight' else v)
        else:
            raise KeyError(name)

    def swin_downsample(m, name, v):
        si, leaf, field = m.group(1), m.group(2), m.group(3)
        if leaf == 'reduction':
            # Linear(4C -> 2C), no bias; permute the 4C input axis
            w = linear_w(v)                       # (4C, 2C)
            idx = _merge_perm(w.shape[0] // 4)
            imp.put('params', swin + (f'merge{si}', 'kernel'), w[idx])
        else:
            vv = np.asarray(v)[_merge_perm(len(np.asarray(v)) // 4)]
            _ln(swin + (f'merge_ln{si}',), field, vv)

    def swin_outnorm(m, name, v):
        i, field = m.group(1), m.group(2)
        _ln(swin + (f'out_norm{i}',), field, v)

    def neck_conv(m, name, v):
        kind, i, leaf, field = (m.group(1), m.group(2), m.group(3),
                                m.group(4))
        ours = 'lateral' if kind == 'lateral_convs' else 'fpn'
        base = neck + (f'{ours}_{i}',)
        if leaf == 'conv' and field == 'weight':
            imp.put('params', base + ('conv', 'kernel'), conv2d_w(v))
        elif leaf == 'bn':
            imp.bn(base + ('bn',), field, v)
        else:
            raise KeyError(name)

    return [
        (re.compile(r'image_backbone\.patch_embed\.(projection|norm)\.'
                    r'(\w+)$'), swin_patch),
        (re.compile(r'image_backbone\.stages\.(\d+)\.blocks\.(\d+)\.'
                    r'([\w.]+?)\.(\w+)$'), swin_block),
        (re.compile(r'image_backbone\.stages\.(\d+)\.downsample\.'
                    r'(reduction|norm)\.(\w+)$'), swin_downsample),
        (re.compile(r'image_backbone\.norm(\d+)\.(\w+)$'), swin_outnorm),
        (re.compile(r'neck\.(lateral_convs|fpn_convs)\.(\d+)\.(conv|bn)\.'
                    r'(\w+)$'), neck_conv),
        (re.compile(r'vfe\.pfn_layers\.(\d+)\.(linear|norm)\.(\w+)$'), pfn),
        (re.compile(r'backbone_2d\.blocks\.(\d+)\.(\d+)\.(\w+)$'), bev_block),
        (re.compile(r'backbone_2d\.deblocks\.(\d+)\.(\d+)\.(\w+)$'),
         bev_deblock),
        (re.compile(r'dense_head\.(conv_cls|conv_box|conv_dir_cls)\.'
                    r'(weight|bias)$'), head_conv),
        (re.compile(r'backbone_3d\.(conv_input|conv_out|conv\d)'
                    r'(?:\.(\d+))?\.(\d+)\.(\w+)$'), sp_conv),
    ]


def import_state_dict(state_dict, variables, logger=None):
    """state_dict {name: np array} -> new `variables` with matched leaves
    replaced. Returns (variables, report) where report lists loaded and
    unmatched source names."""
    import jax
    import jax.numpy as jnp
    params = jax.tree_util.tree_map(np.asarray, dict(variables['params']))
    stats = jax.tree_util.tree_map(
        np.asarray, dict(variables.get('batch_stats', {})))
    imp = _Importer(params, stats)
    rules = _rules(imp)
    for name, value in state_dict.items():
        value = np.asarray(value)
        for rx, fn in rules:
            m = rx.match(name)
            if m is None:
                continue
            try:
                fn(m, name, value)
                imp.loaded.append(name)
            except (KeyError, ValueError) as e:
                imp.unmatched.append((name, str(e)))
            break
        else:
            imp.unmatched.append((name, 'no rule'))
    if logger is not None:
        logger.info(f'torch import: {len(imp.loaded)} loaded, '
                    f'{len(imp.unmatched)} unmatched')
        for name, why in imp.unmatched:
            logger.info(f'  unmatched: {name} ({why})')
    out = {'params': jax.tree_util.tree_map(jnp.asarray, params)}
    if stats:
        out['batch_stats'] = jax.tree_util.tree_map(jnp.asarray, stats)
    for k, v in variables.items():
        out.setdefault(k, v)
    return out, {'loaded': imp.loaded, 'unmatched': imp.unmatched}
