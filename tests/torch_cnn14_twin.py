"""Minimal PyTorch twin of the AFx-Rep Cnn14 for conversion-parity testing.

Structurally equivalent to the reference encoder
(reference: st_ito/models/panns.py:121-281) with identical state_dict keys,
but the log-mel front end uses torch.stft directly (numerically equal to
torchlibrosa's conv-based STFT, which is unavailable here). Test-only code.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchConvBlock(nn.Module):
    def __init__(self, in_c, out_c, use_batchnorm=True):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, out_c, 3, 1, 1, bias=False)
        self.conv2 = nn.Conv2d(out_c, out_c, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_c) if use_batchnorm else nn.Identity()
        self.bn2 = nn.BatchNorm2d(out_c) if use_batchnorm else nn.Identity()

    def forward(self, x, pool=True):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        if pool:
            x = F.avg_pool2d(x, 2)
        return x


class TorchCnn14Twin(nn.Module):
    def __init__(self, embed_dim, sample_rate, window_size, hop_size,
                 mel_bins, fmin, fmax, use_batchnorm=True, input_norm="minmax",
                 mel_matrix=None):
        super().__init__()
        self.window_size = window_size
        self.hop_size = hop_size
        self.input_norm = input_norm
        self.register_buffer("mel_matrix", torch.from_numpy(np.asarray(mel_matrix)))
        self.register_buffer("window", torch.hann_window(window_size, periodic=True))
        self.bn0 = nn.BatchNorm2d(mel_bins)
        chans = [64, 128, 256, 512, 1024, 2048]
        in_c = 1
        for i, c in enumerate(chans):
            setattr(self, f"conv_block{i+1}", TorchConvBlock(in_c, c, use_batchnorm))
            in_c = c
        self.fc_mid = nn.Linear(2048, embed_dim)
        self.fc_side = nn.Linear(2048, embed_dim)

    def forward(self, x):
        bs, chs, T = x.shape
        if chs == 2:
            mid = (x[:, 0] + x[:, 1]) / 2
            side = (x[:, 0] - x[:, 1]) / 2
            x = torch.stack([mid, side], dim=1)
        x = x.reshape(bs * chs, T)
        S = torch.stft(x, self.window_size, self.hop_size, window=self.window,
                       center=True, pad_mode="reflect", return_complex=True)
        S = S.abs() ** 2  # (N, F, frames)
        mel = torch.matmul(S.transpose(1, 2), self.mel_matrix)
        h = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
        h = h[:, None, :, :]
        if self.input_norm == "minmax":
            h = h.clamp(-80, 40)
            h = (h + 80) / 120
            h = h * 2 - 1
        for i in range(6):
            h = getattr(self, f"conv_block{i+1}")(h, pool=(i < 5))
        h = h.mean(dim=3)
        h = h.max(dim=2)[0] + h.mean(dim=2)
        h = h.reshape(bs, chs, -1)
        if chs == 1:
            m = self.fc_mid(h[:, 0])
            return m, m
        return self.fc_mid(h[:, 0]), self.fc_side(h[:, 1])
