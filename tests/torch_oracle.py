"""Torch oracle of the reference dual-stream conformer, for parity tests only.

Independent re-derivation of the architecture described in SURVEY.md §2
(reference: modules/conform/Gconform.py, modules/attention/base_attention.py,
modules/conv/base_conv.py). State-dict key names intentionally match the
reference so the SOME-TPU checkpoint converter can be validated against it.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleFFN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.ln1 = nn.Linear(dim, dim * 4)
        self.ln2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.ln2(F.silu(self.ln1(x)))


class OracleAttention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads = heads
        hidden = heads * dim_head
        self.to_q = nn.Linear(dim, hidden, bias=False)
        self.to_kv = nn.Linear(dim, hidden * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(hidden, dim))

    def forward(self, x, mask=None):
        q = self.to_q(x)
        k, v = self.to_kv(x).chunk(2, dim=2)
        B, T, _ = q.shape
        q, k, v = (t.view(B, T, self.heads, -1).transpose(1, 2) for t in (q, k, v))
        if mask is not None:
            mask = mask[:, None, None, :]
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        out = out.transpose(1, 2).reshape(B, T, -1)
        return self.to_out(out)


class OracleConv(nn.Module):
    def __init__(self, channels, kernel_size=31):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(channels, 2 * channels, 1)
        self.depthwise_conv = nn.Conv1d(channels, channels, kernel_size,
                                        padding=(kernel_size - 1) // 2, groups=channels)
        self.norm = nn.BatchNorm1d(channels)
        self.pointwise_conv2 = nn.Conv1d(channels, channels, 1)

    def forward(self, x):
        x = x.transpose(1, 2)
        x = F.glu(self.pointwise_conv1(x), dim=1)
        x = self.depthwise_conv(x)
        x = F.silu(self.norm(x))
        x = self.pointwise_conv2(x)
        return x.transpose(1, 2)


class OracleBlock(nn.Module):
    def __init__(self, dim, kernel_size=31, heads=4, dim_head=64):
        super().__init__()
        self.ffn1 = OracleFFN(dim)
        self.ffn2 = OracleFFN(dim)
        self.att = OracleAttention(dim, heads, dim_head)
        self.conv = OracleConv(dim, kernel_size)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.norm4 = nn.LayerNorm(dim)
        self.norm5 = nn.LayerNorm(dim)

    def forward(self, x, mask=None):
        x = self.ffn1(self.norm1(x)) * 0.5 + x
        x = self.att(self.norm2(x), mask=mask) + x
        x = self.conv(self.norm3(x)) + x
        x = self.ffn2(self.norm4(x)) * 0.5 + x
        return self.norm5(x)


class OracleGLUGate(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Linear(dim, dim * 2)

    def forward(self, x):
        return F.glu(self.proj(x), dim=2)


class OracleDualBlock(nn.Module):
    def __init__(self, dim, kernel_size=31, heads=4, dim_head=64):
        super().__init__()
        self.att1 = OracleBlock(dim, kernel_size, heads, dim_head)
        self.att2 = OracleBlock(dim, kernel_size, heads, dim_head)
        self.glu1 = nn.Sequential(nn.Linear(dim, dim * 2))
        self.glu2 = nn.Sequential(nn.Linear(dim, dim * 2))

    def forward(self, midi, bound):
        midi = self.att1(midi)
        bound = self.att2(bound)
        midi_msg = F.glu(self.glu1(midi), dim=2)
        bound_msg = F.glu(self.glu2(bound), dim=2)
        return midi + bound_msg, bound + midi_msg


class OracleBackbone(nn.Module):
    def __init__(self, lay, dim, indim, outdim, kernel_size=31, heads=4, dim_head=64):
        super().__init__()
        self.inln = nn.Linear(indim, dim)
        self.inln1 = nn.Linear(indim, dim)
        self.outln = nn.Linear(dim, outdim)
        self.cutheard = nn.Linear(dim, 1)
        self.cf_lay = nn.ModuleList(
            [OracleDualBlock(dim, kernel_size, heads, dim_head) for _ in range(lay)])
        self.att1 = OracleBlock(dim, kernel_size, heads, dim_head)
        self.att2 = OracleBlock(dim, kernel_size, heads, dim_head)

    def forward(self, x, pitch=None, mask=None):
        midi = self.inln(x)
        bound = self.inln1(x)
        if mask is not None:
            midi = midi.masked_fill(~mask.unsqueeze(-1), 0)
        for blk in self.cf_lay:
            midi, bound = blk(midi, bound)
            if mask is not None:
                midi = midi.masked_fill(~mask.unsqueeze(-1), 0)
        midi = self.att1(midi)
        bound = self.att2(bound)
        bound_prob = torch.sigmoid(self.cutheard(bound)).squeeze(-1)
        return self.outln(midi), bound_prob


class OracleModel(nn.Module):
    """midi_conforms-equivalent wrapper; state_dict keys start with 'model.'."""

    def __init__(self, lay, dim, indim, outdim, kernel_size=31, heads=4, dim_head=64):
        super().__init__()
        self.model = OracleBackbone(lay, dim, indim, outdim, kernel_size, heads, dim_head)

    def forward(self, x, f0=None, mask=None, softmax=False, sig=False):
        midi, bound = self.model(x, f0, mask)
        if sig:
            midi = torch.sigmoid(midi)
        if softmax:
            midi = F.softmax(midi, dim=2)
        return midi, bound
