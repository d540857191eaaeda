"""Config-driven functional torch forward of PitchClassNet (test oracle).

An independent reimplementation of the reference network's forward pass
(reference models.py:246-817) in plain torch functional calls, driven by an
exported state_dict plus our Config. Used by tests/test_torch_port.py to
check cross-framework logits parity for EVERY architecture variant —
resblock, denseblock, p2pc_conv, pc2p_mem, stay_sixth, only_semitones,
local mode, max_pool heads, multi-scale merge.

Weight shapes are read from the state_dict (no channel-schedule arithmetic
here), which keeps this oracle independent of models/schedule.py.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def _g(sd, k):
    return torch.tensor(np.asarray(sd[k])).double()


def _bn(sd, x, p):
    return F.batch_norm(x, _g(sd, p + ".running_mean"),
                        _g(sd, p + ".running_var"),
                        _g(sd, p + ".weight"), _g(sd, p + ".bias"),
                        training=False, eps=1e-5)


def _lrelu(x):
    return F.leaky_relu(x, 0.01)


def _eqconv(sd, x, p, same_depth_padding):
    w = _g(sd, p + ".weight")
    pad_t = w.shape[3] // 2 if same_depth_padding else 0
    xw = torch.cat([x, x[:, :, : x.shape[2] - 1, :]], dim=2)
    return F.conv2d(xw, w, _g(sd, p + ".bias"), padding=(0, pad_t))


def _circ_conv(sd, x, p, stride=(1, 1), pad=None):
    w = _g(sd, p + ".weight")
    if pad is None:
        pad = (w.shape[2] // 2, w.shape[3] // 2)
    xp = F.pad(x, (pad[1], pad[1], pad[0], pad[0]), mode="circular")
    return F.conv2d(xp, w, _g(sd, p + ".bias"), stride=stride)


def _octave_pool_max(x):
    p = x.shape[2]
    ks = math.ceil(p / 12)
    pad = ks * 12 - p
    if pad:
        fill = torch.full((x.shape[0], x.shape[1], pad, x.shape[3]),
                          float("-inf")).double()
        x = torch.cat([x, fill], dim=2)
    n, ch, _, t = x.shape
    return x.reshape(n, ch, ks, 12, t).max(dim=2).values


def _octave_pool_conv(sd, x, prefix):
    w = _g(sd, prefix + ".weight")
    ks = w.shape[2]
    pad = ks * 12 - x.shape[2]
    if pad:
        fill = torch.zeros((x.shape[0], x.shape[1], pad, x.shape[3])).double()
        x = torch.cat([x, fill], dim=2)
    y = F.conv2d(x, w, _g(sd, prefix + ".bias"), dilation=(12, 1))
    return _lrelu(_bn(sd, y, prefix + ".bn"))


def _dense_block(sd, cfg, x, prefix, equivariant, multi_path=False):
    features = [x]
    for i in range(1, cfg.conv_layers + 1):
        lp = f"{prefix}.layer.0.denselayer{i}"
        k = (2 * (i - 1) + 3) if multi_path else cfg.kernel_size
        inp = torch.cat(features, dim=1)
        y = _lrelu(_bn(sd, inp, lp + ".norm1"))
        if equivariant:
            y = _eqconv(sd, y, lp + ".conv1", same_depth_padding=False)
        else:
            y = F.conv2d(y, _g(sd, lp + ".conv1.weight"))
        y = F.relu(_bn(sd, y, lp + ".norm2"))
        if equivariant:
            y = _eqconv(sd, y, lp + ".conv2", same_depth_padding=True)
        else:
            y = F.conv2d(y, _g(sd, lp + ".conv2.weight"),
                         padding=(k // 2, k // 2))
        features.append(y)
    return torch.cat(features, dim=1)


def _res_block(sd, x, prefix, equivariant):
    if equivariant:
        r = _eqconv(sd, x, prefix + ".conv1", same_depth_padding=True)
    else:
        r = _circ_conv(sd, x, prefix + ".conv1")
    r = _lrelu(_bn(sd, r, prefix + ".b1"))
    if equivariant:
        r = _eqconv(sd, r, prefix + ".conv2", same_depth_padding=True)
    else:
        r = _circ_conv(sd, r, prefix + ".conv2")
    r = _bn(sd, r, prefix + ".b2")
    return _lrelu(x + r)


def _conv_stack(sd, cfg, x, prefix, equivariant):
    if cfg.resblock:
        if equivariant:
            x = _eqconv(sd, x, prefix + ".layer.0", same_depth_padding=True)
        else:
            x = _circ_conv(sd, x, prefix + ".layer.0")
        x = _lrelu(_bn(sd, x, prefix + ".layer.1"))
        for i in range(cfg.conv_layers):
            x = _res_block(sd, x, f"{prefix}.layer.{3 + i}", equivariant)
        return x
    if cfg.denseblock:
        return _dense_block(sd, cfg, x, prefix, equivariant)
    for i in range(cfg.conv_layers):
        idx = 3 * i
        if equivariant:
            x = _eqconv(sd, x, f"{prefix}.layer.{idx}",
                        same_depth_padding=True)
        else:
            x = _circ_conv(sd, x, f"{prefix}.layer.{idx}")
        x = _lrelu(_bn(sd, x, f"{prefix}.layer.{idx + 1}"))
    return x


def _mem_add(p, psix):
    n, c1, P, T = p.shape
    c2, rows = psix.shape[1], psix.shape[2]
    pcsum = psix.reshape(n, c1, c2 // c1, rows, T).sum(dim=2)
    blocks = P // rows
    out = p.reshape(n, c1, rows, blocks, T) + pcsum[:, :, :, None]
    return out.reshape(n, c1, P, T)


def _tile(x, pitches):
    reps = math.ceil(pitches / x.shape[2])
    return x.repeat(1, 1, reps, 1)[:, :, :pitches]


def _head(sd, cfg, pc, prefix, kind):
    x = pc
    k = cfg.kernel_size
    for i in range(cfg.head_layers):
        idx = 3 * i
        last = i == cfg.head_layers - 1
        lp = f"{prefix}.{idx}"
        if last:
            if kind == "genre":
                x = F.conv2d(x, _g(sd, lp + ".weight"), _g(sd, lp + ".bias"))
            else:
                x = _eqconv(sd, x, lp, same_depth_padding=False)
                if cfg.local:
                    win = (cfg.frames * cfg.loc_window_size
                           - cfg.head_layers * (k - 1))
                    x = F.max_pool2d(x, (1, win), stride=1)
        else:
            if kind == "genre":
                x = F.conv2d(x, _g(sd, lp + ".weight"), _g(sd, lp + ".bias"))
            else:
                x = _eqconv(sd, x, lp, same_depth_padding=False)
            x = _lrelu(_bn(sd, x, f"{prefix}.{idx + 1}"))
    return x[:, 0]  # (N, rows, T')


def _masked_reduce(cfg, x, seq_length):
    """(N, rows, T) -> (N, rows): per-sample mean/max over valid frames
    (reference models.py:754-785, per-sample python loop)."""
    if seq_length is None:
        return (x.max(dim=-1).values if cfg.max_pool else x.mean(dim=-1))
    outs = []
    for n in range(x.shape[0]):
        length = float(seq_length[n])
        for _ in range(cfg.num_layers - 1):
            length = math.floor(length / cfg.time_pool_size)
        length = int(length) - (cfg.kernel_size - 1) * cfg.head_layers
        length = max(length, 1)
        xn = x[n, :, :length]
        outs.append(xn.max(dim=-1).values if cfg.max_pool else xn.mean(dim=-1))
    return torch.stack(outs)


def torch_forward(sd, cfg, mel_nchw, seq_length=None, prefix=""):
    """Full functional forward. mel_nchw: (N, 1, pitches, T) double.

    Returns (key, tonic[, genre]) with the same shapes as the flax model:
    global mode (N, 12)/(N, 12)/(N, 11); local mode time-major (N, T', d).
    """
    def g(k):
        return _g(sd, prefix + k)

    def sub(d):
        return {k[len(prefix):]: v for k, v in d.items()} if prefix else d

    sd = {k: v for k, v in sd.items()}
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}

    semitone_rows = cfg.pitches if cfg.only_semitones else cfg.pitches // 3
    p_rows = semitone_rows if cfg.stay_sixth else cfg.pitches

    p, pc = mel_nchw, None
    for li in range(cfg.num_layers):
        mp = f"model.{li}"
        if li == 0:
            if not cfg.only_semitones:
                ps = _circ_conv(sd, p, mp + ".pool_semi", stride=(3, 1),
                                pad=(0, 1))
                ps = _lrelu(_bn(sd, ps, mp + ".pool_semi_b"))
            else:
                ps = p
            if cfg.stay_sixth:
                p = ps
            pc = (_octave_pool_conv(sd, ps, mp + ".pool") if cfg.p2pc_conv
                  else _octave_pool_max(ps))
            pc = _conv_stack(sd, cfg, pc, mp + ".pc2pc", True)
            continue
        third = (not cfg.stay_sixth) and (not cfg.only_semitones)
        p2 = None
        if third:
            psix = F.conv_transpose2d(pc, _g(sd, mp + ".up_sixth.weight"),
                                      _g(sd, mp + ".up_sixth.bias"),
                                      stride=(3, 1))
            psix = _lrelu(_bn(sd, psix, mp + ".up_sixth_b"))
            if cfg.pc2p_mem:
                p = _mem_add(p, psix)
            else:
                p2 = _tile(psix, p_rows)
        elif not cfg.pc2p_mem:
            p2 = _tile(pc, p_rows)
        if not cfg.pc2p_mem:
            p = torch.cat([p, p2], dim=1)
        p = _conv_stack(sd, cfg, p, mp + ".p2p", False)
        if third:
            pc2 = _circ_conv(sd, p, mp + ".pool_semi", stride=(3, 1),
                             pad=(0, 1))
            pc2 = _lrelu(_bn(sd, pc2, mp + ".pool_semi_b"))
        else:
            pc2 = p
        pc2 = (_octave_pool_conv(sd, pc2, mp + ".pool") if cfg.p2pc_conv
               else _octave_pool_max(pc2))
        pc = torch.cat([pc, pc2], dim=1)
        pc = _conv_stack(sd, cfg, pc, mp + ".pc2pc", True)
        if not cfg.local:
            p = F.max_pool2d(p, (1, cfg.time_pool_size))
            pc = F.max_pool2d(pc, (1, cfg.time_pool_size))

    tonic = _head(sd, cfg, pc, "tonic_classifier", "tonic")
    key = _head(sd, cfg, pc, "key_classifier", "key")
    genre = (_head(sd, cfg, pc, "genre_classifier", "genre")
             if cfg.genre else None)

    if cfg.local:
        key_out = torch.sigmoid(key.permute(0, 2, 1))
        tonic_out = tonic.permute(0, 2, 1)
        if cfg.genre:
            return key_out, tonic_out, genre.permute(0, 2, 1)
        return key_out, tonic_out
    seq = seq_length if cfg.frames > 0 else None
    tonic_out = _masked_reduce(cfg, tonic, seq)
    key_out = torch.sigmoid(_masked_reduce(cfg, key, seq))
    if cfg.genre:
        return key_out, tonic_out, _masked_reduce(cfg, genre, seq)
    return key_out, tonic_out


def torch_forward_multi(sd, cfg, mel1, mel2, seq_length=None):
    """Two-scale ensemble merge (reference models.py:1118-1189, intended
    semantics per models/multi_scale.py's documented bug fixes)."""
    cfg1 = cfg.replace(multi_scale=False)
    cfg2 = cfg.replace(only_semitones=True, multi_scale=False)
    out1 = torch_forward(sd, cfg1, mel1, seq_length, prefix="model1.")
    out2 = torch_forward(sd, cfg2, mel2, seq_length, prefix="model2.")
    if cfg.linear_reg_multi:
        wk, bk = _g(sd, "wk"), _g(sd, "bk")
        wt, bt = _g(sd, "wt"), _g(sd, "bt")
        key = torch.sigmoid(wk[0] * out1[0] + wk[1] * out2[0] + bk)
        tonic = wt[0] * out1[1] + wt[1] * out2[1] + bt
        if cfg.genre:
            wg, bg = _g(sd, "wg"), _g(sd, "bg")
            genre = wg[0] * out1[2] + wg[1] * out2[2] + bg
            return key, tonic, genre
        return key, tonic
    key = (out1[0] + out2[0]) / 2
    tonic = (out1[1] + out2[1]) / 2
    if cfg.genre:
        return key, tonic, (out1[2] + out2[2]) / 2
    return key, tonic
