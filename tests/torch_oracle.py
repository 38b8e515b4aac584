"""Independent PyTorch oracle of the reference architecture, for tests only.

Written from the architecture documented in SURVEY.md C4-C6 (reference
``src/models.py:6-130``): double-conv blocks with BatchNorm, a dilated
512-channel bridge, squeeze-excite x spatial attention gates, align-corners
bilinear upsampling, a 64->32->16->1 head, and a residual add of input
channel 0. Attribute names follow the reference *checkpoint format* (SURVEY.md
C11) so the importer can be exercised against the same key namespace that real
reference checkpoints use.
"""

import torch
from torch import nn
import torch.nn.functional as F


class OracleConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x))))))


class OracleAttentionGate(nn.Module):
    def __init__(self, cx, cg, reduction=8):
        super().__init__()
        self.channel_attention = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(cx, cx // reduction, 1),
            nn.ReLU(),
            nn.Conv2d(cx // reduction, cx, 1),
            nn.Sigmoid(),
        )
        self.spatial_attention = nn.Sequential(nn.Conv2d(cg, 1, 1), nn.Sigmoid())

    def forward(self, x, gating):
        x = x * self.channel_attention(x)
        if gating.shape[-2:] != x.shape[-2:]:
            gating = F.interpolate(gating, size=x.shape[-2:], mode="bilinear", align_corners=True)
        return x * self.spatial_attention(gating)


class OracleUNet(nn.Module):
    def __init__(self, in_channels=3):
        super().__init__()
        self.enc1 = OracleConvBlock(in_channels, 64)
        self.enc2 = OracleConvBlock(64, 128)
        self.enc3 = OracleConvBlock(128, 256)
        self.bridge = nn.Sequential(
            nn.Conv2d(256, 512, 3, padding=2, dilation=2),
            nn.BatchNorm2d(512),
            nn.ReLU(),
            nn.Conv2d(512, 512, 3, padding=2, dilation=2),
            nn.BatchNorm2d(512),
            nn.ReLU(),
        )
        self.dec3 = OracleConvBlock(512 + 256, 256)
        self.dec2 = OracleConvBlock(256 + 128, 128)
        self.dec1 = OracleConvBlock(128 + 64, 64)
        self.out_conv1 = nn.Conv2d(64, 32, 3, padding=1)
        self.out_bn1 = nn.BatchNorm2d(32)
        self.out_conv2 = nn.Conv2d(32, 16, 3, padding=1)
        self.out_bn2 = nn.BatchNorm2d(16)
        self.final = nn.Conv2d(16, 1, 1)
        self.att3 = OracleAttentionGate(256, 512)
        self.att2 = OracleAttentionGate(128, 256)
        self.att1 = OracleAttentionGate(64, 128)

    def forward(self, x):
        coarse = x[:, 0:1]
        e1 = self.enc1(x)
        e2 = self.enc2(F.max_pool2d(e1, 2))
        e3 = self.enc3(F.max_pool2d(e2, 2))
        b = self.bridge(e3)
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True)  # noqa: E731
        d3 = self.dec3(torch.cat([b, self.att3(e3, b)], dim=1))
        u3 = up(d3)
        d2 = self.dec2(torch.cat([u3, self.att2(e2, u3)], dim=1))
        u2 = up(d2)
        d1 = self.dec1(torch.cat([u2, self.att1(e1, u2)], dim=1))
        h = F.relu(self.out_bn1(self.out_conv1(d1)))
        h = F.relu(self.out_bn2(self.out_conv2(h)))
        return self.final(h) + coarse
