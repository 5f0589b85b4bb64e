"""PyTorch oracle for numerical parity tests.

An independent torch implementation of the TF-Locoformer MSS semantics
(documented in SURVEY.md §2.1), producing the same state_dict key schema as
the reference so it doubles as a fixture for the checkpoint converter.
Test-only code — the shipped framework never imports this.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def rope_rotate(x: torch.Tensor, theta: float = 10000.0) -> torch.Tensor:
    """Interleaved-pair RoPE (rotary-embedding-torch 0.6.1 convention)."""
    L, d = x.shape[-2], x.shape[-1]
    inv = 1.0 / theta ** (torch.arange(0, d, 2, dtype=torch.float64) / d)
    ang = torch.outer(torch.arange(L, dtype=torch.float64), inv).float()  # [L, d/2]
    cos, sin = ang.cos(), ang.sin()
    xp = x.float().reshape(x.shape[:-1] + (d // 2, 2))
    xe, xo = xp[..., 0], xp[..., 1]
    out = torch.stack([xe * cos - xo * sin, xo * cos + xe * sin], dim=-1)
    return out.reshape(x.shape)


class OracleRMSGroupNorm(nn.Module):
    def __init__(self, num_groups, dim, eps=1e-8):
        super().__init__()
        self.g, self.dpg, self.eps = num_groups, dim // num_groups, eps
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        shp = x.shape
        xg = x.reshape(shp[:-1] + (self.g, self.dpg))
        rms = xg.norm(2, dim=-1, keepdim=True) * self.dpg ** -0.5
        return (xg / (rms + self.eps)).reshape(shp) * self.gamma


class OracleSwiGLU(nn.Module):
    def __init__(self, dim, inner, k, s, swiglu=True):
        super().__init__()
        self.inner, self.k, self.s, self.swiglu = inner, k, s, swiglu
        if swiglu:
            self.conv1d = nn.Conv1d(dim, inner * 2, k, stride=s)
        else:
            # ConvDeconv1d schema: nn.Sequential(net.0=conv, net.3=deconv)
            self.net = nn.Sequential(nn.Conv1d(dim, inner, k, stride=s), nn.SiLU(),
                                     nn.Dropout(0.0), nn.ConvTranspose1d(inner, dim, k, stride=s),
                                     nn.Dropout(0.0))
        if swiglu:
            self.deconv1d = nn.ConvTranspose1d(inner, dim, k, stride=s)

    def forward(self, x):  # [B, S1, S2, C]
        b, s1, s2, h = x.shape
        d = self.k - self.s
        y = x.reshape(b * s1, s2, h).transpose(-1, -2)
        total = math.ceil((s2 + 2 * d - self.k) / self.s) * self.s + self.k
        y = F.pad(y, (d, total - s2 - d))
        if self.swiglu:
            y = self.conv1d(y)
            y = y[:, :self.inner] * F.silu(y[:, self.inner:])
            y = self.deconv1d(y)
        else:
            y = self.net(y)
        y = y.transpose(-1, -2)[:, d:d + s2, :]
        return y.reshape(b, s1, s2, h)


class OracleMHSA(nn.Module):
    def __init__(self, emb, attn_dim, heads, use_rope=True):
        super().__init__()
        self.h, self.use_rope = heads, use_rope
        self.qkv = nn.Linear(emb, attn_dim * 3, bias=False)
        self.aggregate_heads = nn.Sequential(nn.Linear(attn_dim, emb, bias=False),
                                             nn.Dropout(0.0))

    def forward(self, x):  # [B, L, C]
        b, l, _ = x.shape
        y = self.qkv(x).reshape(b, l, 3, self.h, -1).movedim(-2, 1)  # [B,H,L,3,D]
        q, k, v = y[..., 0, :], y[..., 1, :], y[..., 2, :]
        if self.use_rope:
            q, k = rope_rotate(q), rope_rotate(k)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, l, -1)
        return self.aggregate_heads(out)


class OracleLocoBlock(nn.Module):
    def __init__(self, emb, num_groups, heads, attn_dim, ffn_types, ffn_dims,
                 k, s, eps=1e-5, norm_type="rmsgroupnorm", use_rope=True):
        super().__init__()
        self.macaron = len(ffn_types) == 2

        def mk_norm():
            return OracleRMSGroupNorm(num_groups, emb, eps) if norm_type == "rmsgroupnorm" \
                else nn.LayerNorm(emb, eps=eps)

        self.ffn_norm = nn.ModuleList()
        self.ffn = nn.ModuleList()
        for t, d in zip(ffn_types[::-1], ffn_dims[::-1]):  # reversed storage
            self.ffn_norm.append(mk_norm())
            self.ffn.append(OracleSwiGLU(emb, d, k, s, swiglu=(t == "swiglu_conv1d")))
        self.attn_norm = mk_norm()
        self.attn = OracleMHSA(emb, attn_dim, heads, use_rope)

    def forward(self, x):  # [B, S1, S2, C]
        b, t, f, c = x.shape
        if self.macaron:
            x = x + self.ffn[-1](self.ffn_norm[-1](x))
        y = self.attn_norm(x).reshape(b * t, f, c)
        x = self.attn(y).reshape(b, t, f, c) + x
        return x + self.ffn[0](self.ffn_norm[0](x))


class OracleTFBlock(nn.Module):
    def __init__(self, tf_order="ft", **kw):
        super().__init__()
        self.tf_order = tf_order
        self.freq_path = OracleLocoBlock(**kw)
        self.frame_path = OracleLocoBlock(**kw)

    def forward(self, x):  # [B, C, T, F] (reference layout)
        if self.tf_order == "ft":
            y = self.freq_path(x.movedim(1, -1))           # [B,T,F,C]
            y = self.frame_path(y.transpose(1, 2))          # [B,F,T,C]
            return y.transpose(-1, 1)                       # [B,C,T,F]
        y = self.frame_path(x.transpose(1, -1))             # [B,F,T,C]
        y = self.freq_path(y.transpose(1, 2))               # [B,T,F,C]
        return y.movedim(-1, 1)


class OracleMSS(nn.Module):
    def __init__(self, n_fft=512, hop=128, n_sources=4, n_layers=2, emb=16,
                 num_groups=4, heads=2, attn_dim=16,
                 ffn_types=("swiglu_conv1d", "swiglu_conv1d"), ffn_dims=(32, 32),
                 k=4, s=1, eps=1e-5, tf_order="ft", norm_type="rmsgroupnorm",
                 use_rope=True):
        super().__init__()
        self.n_fft, self.hop, self.S = n_fft, hop, n_sources
        self.conv = nn.Sequential(nn.Conv2d(2, emb, (3, 3), padding=(1, 1)),
                                  nn.GroupNorm(1, emb, eps=eps))
        blk = dict(emb=emb, num_groups=num_groups, heads=heads, attn_dim=attn_dim,
                   ffn_types=ffn_types, ffn_dims=ffn_dims, k=k, s=s, eps=eps,
                   norm_type=norm_type, use_rope=use_rope)
        self.blocks = nn.ModuleList([OracleTFBlock(tf_order=tf_order, **blk)
                                     for _ in range(n_layers)])
        self.deconv = nn.ConvTranspose2d(emb, n_sources * 2, (3, 3), padding=(1, 1))

    def forward(self, audio, time_domain=True):  # [B, T]
        b, length = audio.shape
        w = torch.hann_window(self.n_fft)
        spec = torch.stft(audio, self.n_fft, self.hop, window=w, return_complex=True)
        x = torch.stack([spec.real, spec.imag], 1).transpose(-1, -2)  # [B,2,T,F]
        nt, nf = x.shape[2], x.shape[3]
        x = self.conv(x)
        for blk in self.blocks:
            x = blk(x)
        x = self.deconv(x).view(b, self.S, 2, nt, nf)
        spec_out = torch.complex(x[:, :, 0], x[:, :, 1]).transpose(-1, -2)  # [B,S,F,T]
        if not time_domain:
            return spec_out
        return torch.istft(spec_out.reshape(b * self.S, nf, nt), self.n_fft,
                           self.hop, window=w, length=length).view(b, self.S, length)
