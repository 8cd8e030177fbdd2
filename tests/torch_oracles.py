"""Independent torch oracles reproducing the reference module math.

These are *test-only* re-derivations of the semantics documented in
SURVEY.md §2 (ref: model/modules.py, model/impl/gsm.py, model/impl/gsf.py),
used to validate the JAX implementations with shared weights. Tensors are
torch-native layouts: (B, C, T) for temporal, (B*T, C, H, W) for spatial.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class ChannelLayerNorm(nn.Module):
    """LayerNorm over dim 1 of (B, C, T) (ref: model/modules.py:320-363)."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(1, c, 1))
        self.bias = nn.Parameter(torch.zeros(1, c, 1))
        self.eps = eps

    def forward(self, x):
        mu = x.mean(dim=1, keepdim=True)
        res = x - mu
        var = (res ** 2).mean(dim=1, keepdim=True)
        return res / torch.sqrt(var + self.eps) * self.weight + self.bias


def up_size_of(ks, k):
    up = round((ks + 1) * k)
    return up + 1 if up % 2 == 0 else up


class OracleSGPBlock(nn.Module):
    """ref: model/modules.py:89-188, mode='normal'."""

    def __init__(self, c, ks, k):
        super().__init__()
        up = up_size_of(ks, k)
        self.ln = ChannelLayerNorm(c)
        self.gn = nn.GroupNorm(16, c)
        self.psi = nn.Conv1d(c, c, ks, padding=ks // 2, groups=c)
        self.fc = nn.Conv1d(c, c, 1, groups=c)
        self.convw = nn.Conv1d(c, c, ks, padding=ks // 2, groups=c)
        self.convkw = nn.Conv1d(c, c, up, padding=up // 2, groups=c)
        self.global_fc = nn.Conv1d(c, c, 1, groups=c)
        self.mlp = nn.Sequential(
            nn.Conv1d(c, 4 * c, 1), nn.GELU(), nn.Conv1d(4 * c, c, 1)
        )

    def forward(self, x):
        out = self.ln(x)
        phi = torch.relu(self.global_fc(out.mean(dim=-1, keepdim=True)))
        out = (
            self.fc(out) * phi
            + (self.convw(out) + self.convkw(out)) * self.psi(out)
            + out
        )
        out = x + out
        return out + self.mlp(self.gn(out))


class OracleSGPMixer(nn.Module):
    """ref: model/modules.py:190-318, concat=True."""

    def __init__(self, c, ks, k, t_size):
        super().__init__()
        up = up_size_of(ks, k)
        self.ln1 = ChannelLayerNorm(c)
        self.ln2 = ChannelLayerNorm(c)
        self.gn = nn.GroupNorm(16, c)
        mk = lambda kk: nn.Conv1d(c, c, kk, padding=kk // 2, groups=c)
        self.psi1, self.psi2 = mk(ks), mk(ks)
        self.convw1, self.convkw1 = mk(ks), mk(up)
        self.convw2, self.convkw2 = mk(ks), mk(up)
        self.fc1, self.fc2 = mk(1), mk(1)
        self.global_fc1, self.global_fc2 = mk(1), mk(1)
        self.t_size = t_size
        self.concat_fc = nn.Conv1d(6 * c, c, 1)
        self.mlp = nn.Sequential(
            nn.Conv1d(c, 4 * c, 1), nn.GELU(), nn.Conv1d(4 * c, c, 1)
        )

    def forward(self, x, z):
        z = self.ln1(z)
        x = self.ln2(x)
        x = F.interpolate(x, size=self.t_size, mode="linear", align_corners=True)
        phi1 = torch.relu(self.global_fc1(z.mean(dim=-1, keepdim=True)))
        phi2 = torch.relu(self.global_fc2(x.mean(dim=-1, keepdim=True)))
        out1 = (self.convw1(z) + self.convkw1(z)) * self.psi1(z)
        out2 = (self.convw2(x) + self.convkw2(x)) * self.psi2(x)
        out3 = self.fc1(z) * phi1
        out4 = self.fc2(x) * phi2
        out = torch.cat((out1, out2, out3, out4, z, x), dim=1)
        out = F.gelu(self.concat_fc(out))
        return out + self.mlp(self.gn(out))


class OracleGSM(nn.Module):
    """ref: model/impl/gsm.py:69-116 (CPU port: plain zeros instead of
    torch.cuda.FloatTensor)."""

    def __init__(self, f, t):
        super().__init__()
        self.conv3d = nn.Conv3d(f, 2, (3, 3, 3), padding=1, groups=2)
        nn.init.zeros_(self.conv3d.weight)
        nn.init.zeros_(self.conv3d.bias)
        self.bn = nn.BatchNorm3d(f)
        self.f, self.t = f, t

    def forward(self, x):  # (B*T, F, H, W)
        f, t = self.f, self.t
        b = x.shape[0] // t
        shape = x.shape[1:]
        x = x.view(b, t, *shape).permute(0, 2, 1, 3, 4).contiguous()
        gate = torch.tanh(self.conv3d(torch.relu(self.bn(x))))
        g1, g2 = gate[:, 0:1], gate[:, 1:2]
        x1, x2 = x[:, : f // 2], x[:, f // 2 :]
        y1, y2 = g1 * x1, g2 * x2
        r1, r2 = x1 - y1, x2 - y2
        y1 = torch.cat([y1[:, :, 1:], torch.zeros_like(y1[:, :, :1])], dim=2) + r1
        y2 = torch.cat([torch.zeros_like(y2[:, :, :1]), y2[:, :, :-1]], dim=2) + r2
        y1 = y1.view(b, 2, f // 4, t, *shape[1:]).permute(0, 2, 1, 3, 4, 5)
        y2 = y2.view(b, 2, f // 4, t, *shape[1:]).permute(0, 2, 1, 3, 4, 5)
        y = torch.cat(
            [
                y1.contiguous().view(b, f // 2, t, *shape[1:]),
                y2.contiguous().view(b, f // 2, t, *shape[1:]),
            ],
            dim=1,
        )
        return y.permute(0, 2, 1, 3, 4).contiguous().view(b * t, *shape)


class OracleGSF(nn.Module):
    """ref: model/impl/gsf.py:9-93 with gsf_ch_ratio=100."""

    def __init__(self, f, t):
        super().__init__()
        self.conv3d = nn.Conv3d(f, 2, (3, 3, 3), padding=1, groups=2)
        self.bn = nn.BatchNorm3d(f)
        self.channel_conv1 = nn.Conv2d(2, 1, (3, 3), padding=1)
        self.channel_conv2 = nn.Conv2d(2, 1, (3, 3), padding=1)
        self.f, self.t = f, t

    def forward(self, x):  # (B*T, F, H, W)
        f, t = self.f, self.t
        b = x.shape[0] // t
        shape = x.shape[1:]
        x = x.view(b, t, *shape).permute(0, 2, 1, 3, 4).contiguous()
        gate = torch.tanh(self.conv3d(torch.relu(self.bn(x))))
        g1, g2 = gate[:, 0:1], gate[:, 1:2]
        x1, x2 = x[:, : f // 2], x[:, f // 2 :]
        y1, y2 = g1 * x1, g2 * x2
        r1, r2 = x1 - y1, x2 - y2
        y1 = torch.roll(y1, shifts=-1, dims=2)
        y1[:, :, -1] = 0
        y2 = torch.roll(y2, shifts=1, dims=2)
        y2[:, :, 0] = 0

        def fuse(y, r, conv):
            ym = y.mean(-1).mean(-1).unsqueeze(3)  # (B, C', T, 1)
            rm = r.mean(-1).mean(-1).unsqueeze(3)
            stat = torch.cat([ym, rm], dim=3).permute(0, 3, 1, 2)  # (B,2,C',T)
            w = torch.sigmoid(conv(stat)).squeeze(1).unsqueeze(-1).unsqueeze(-1)
            return y * w + r * (1 - w)

        y1 = fuse(y1, r1, self.channel_conv1)
        y2 = fuse(y2, r2, self.channel_conv2)
        y1 = y1.view(b, 2, f // 4, t, *shape[1:]).permute(0, 2, 1, 3, 4, 5)
        y2 = y2.view(b, 2, f // 4, t, *shape[1:]).permute(0, 2, 1, 3, 4, 5)
        y = torch.cat(
            [
                y1.contiguous().view(b, f // 2, t, *shape[1:]),
                y2.contiguous().view(b, f // 2, t, *shape[1:]),
            ],
            dim=1,
        )
        return y.permute(0, 2, 1, 3, 4).contiguous().view(b * t, *shape)


class OracleYBlock(nn.Module):
    """RegNet-Y bottleneck block (bottle_ratio 1) re-derived from the timm
    topology the reference builds (ref: model/model.py:37-46): conv1 1x1 ->
    conv2 3x3 grouped (stride) -> SE (rd from block INPUT width) -> conv3
    1x1 -> residual (+1x1 downsample when shape changes), BN after every
    conv, ReLU except after conv3 (applied post-residual).

    shift: optional temporal-shift module applied to the block input before
    conv1 only — the residual path sees the unshifted input
    (ref: model/shift.py:89-93)."""

    def __init__(self, in_w, w, stride, group_size, se_ratio=0.25, shift=None):
        super().__init__()
        self.shift = shift
        groups = w // group_size
        self.conv1 = nn.Conv2d(in_w, w, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        rd = int(round(in_w * se_ratio))
        self.se_fc1 = nn.Conv2d(w, rd, 1)
        self.se_fc2 = nn.Conv2d(rd, w, 1)
        self.conv3 = nn.Conv2d(w, w, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(w)
        self.down = None
        if stride != 1 or in_w != w:
            self.down = nn.Conv2d(in_w, w, 1, stride=stride, bias=False)
            self.bn_down = nn.BatchNorm2d(w)

    def forward(self, x):
        sc = x
        if self.shift is not None:
            x = self.shift(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        s = out.mean(dim=(2, 3), keepdim=True)
        s = torch.sigmoid(self.se_fc2(torch.relu(self.se_fc1(s))))
        out = out * s
        out = self.bn3(self.conv3(out))
        if self.down is not None:
            sc = self.bn_down(self.down(sc))
        return torch.relu(out + sc)


class OracleGatedShift(nn.Module):
    """GSF on the first fold_dim channels, passthrough for the rest
    (ref: model/shift.py:64-93); fold_dim = ceil(C//4 / 4) * 4."""

    def __init__(self, channels, clip_len):
        super().__init__()
        self.fold = math.ceil(channels // 4 / 4) * 4
        self.gsf = OracleGSF(self.fold, clip_len)

    def forward(self, x):  # (B*T, C, H, W)
        return torch.cat([self.gsf(x[:, : self.fold]), x[:, self.fold :]], dim=1)


class OracleTDEED(nn.Module):
    """Complete torch T-DEED: RegNet-Y trunk with GSF in stages 3/4,
    additive temporal embedding, SGP U-Net, linear heads
    (ref: model/model.py:23-149 + modules.py:58-87).

    Heads carry no dropout — the train-step parity test neutralizes dropout
    on the JAX side so both forwards are deterministic."""

    def __init__(self, widths, depths, groups, clip_len, num_classes_bg,
                 n_layers, ks, k, stem_w=32):
        super().__init__()
        self.clip_len = clip_len
        self.n_layers = n_layers
        self.stem = nn.Conv2d(3, stem_w, 3, stride=2, padding=1, bias=False)
        self.stem_bn = nn.BatchNorm2d(stem_w)
        blocks, in_w = [], stem_w
        for si, (w, d, g) in enumerate(zip(widths, depths, groups)):
            for bi in range(d):
                shift = OracleGatedShift(in_w, clip_len) if si >= 2 else None
                blocks.append(
                    OracleYBlock(in_w, w, 2 if bi == 0 else 1, g, shift=shift)
                )
                in_w = w
        self.blocks = nn.ModuleList(blocks)
        d_feat = widths[-1]
        self.temp_enc = nn.Parameter(torch.zeros(clip_len, d_feat))
        lens = [math.ceil(clip_len / 2 ** i) for i in range(n_layers + 1)]
        self.sgp = nn.ModuleList(
            [OracleSGPBlock(d_feat, ks, k) for _ in range(2 * n_layers + 1)]
        )
        self.mixers = nn.ModuleList(
            [OracleSGPMixer(d_feat, ks, k, t_size=lens[i]) for i in range(n_layers)]
        )
        self.pools = nn.ModuleList(
            [nn.AdaptiveMaxPool1d(lens[i + 1]) for i in range(n_layers)]
        )
        self.pred_fine = nn.Linear(d_feat, num_classes_bg)
        self.pred_displ = nn.Linear(d_feat, 1)

    def forward(self, x):  # (B, T, 3, H, W) standardized float
        b, t = x.shape[:2]
        f = x.reshape(b * t, *x.shape[2:])
        f = torch.relu(self.stem_bn(self.stem(f)))
        for blk in self.blocks:
            f = blk(f)
        f = f.mean(dim=(2, 3)).view(b, t, -1)
        f = f + self.temp_enc
        z = f.permute(0, 2, 1)
        skips = []
        for i in range(self.n_layers):
            z = self.sgp[i](z)
            skips.append(z)
            z = self.pools[i](z)
        z = self.sgp[self.n_layers](z)
        for i in range(self.n_layers):
            z = self.mixers[-(i + 1)](z, skips[-(i + 1)])
            z = self.sgp[self.n_layers + i + 1](z)
        feat = z.permute(0, 2, 1)
        return self.pred_fine(feat), self.pred_displ(feat)[..., 0]


class OracleRegNetTrunk(nn.Module):
    """Whole RegNet-Y trunk (stem + stages of OracleYBlock) with the
    generate_stages topology, global-average-pooled features."""

    def __init__(self, widths, depths, groups, stem_w=32):
        super().__init__()
        self.stem = nn.Conv2d(3, stem_w, 3, stride=2, padding=1, bias=False)
        self.stem_bn = nn.BatchNorm2d(stem_w)
        blocks = []
        in_w = stem_w
        for w, d, g in zip(widths, depths, groups):
            for bi in range(d):
                blocks.append(OracleYBlock(in_w, w, 2 if bi == 0 else 1, g))
                in_w = w
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        x = torch.relu(self.stem_bn(self.stem(x)))
        for b in self.blocks:
            x = b(x)
        return x.mean(dim=(2, 3))
