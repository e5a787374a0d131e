"""Torch mirrors of the reference models for whole-model numerical
parity tests (VERDICT round-1 item 2).

Each mirror reproduces the reference forward math (file:line cited per
class) with torch module attribute names chosen so ``state_dict()``
yields exactly the reference checkpoint key layout — the same converter
that would load a real reference-trained ``.pth``
(tools/convert_reference_ckpt.py) maps the mirror's weights onto our
Flax params. DropBlock / Dropout positions are filled with
``nn.Identity`` (parity runs in eval mode, where they are no-ops in the
reference too) so Sequential indices line up with the checkpoint keys.
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def randomize_bn(bn, rng):
    """Non-trivial affine + running stats so BN actually tests something."""
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(
            rng.rand(bn.weight.numel()).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(
            rng.randn(bn.bias.numel()).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(
            rng.randn(bn.running_mean.numel()).astype(np.float32) * 0.2))
        bn.running_var.copy_(torch.from_numpy(
            rng.rand(bn.running_var.numel()).astype(np.float32) + 0.5))


def randomize_all_bns(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            randomize_bn(m, rng)


class TorchBottleneck(nn.Module):
    """Reference BottleNeck (backbones.py:42-77): stride on conv1,
    residual add before the final relu."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


class TorchResNet(nn.Module):
    """Reference dilated ResNet trunk (backbones.py:80-137): layer2
    stride 2, layer3 stride 1 dilation 2 (optional layer4 dilation 4),
    maxpool 3/2/1 ceil_mode; downsample on the first block when stride,
    channel growth, or dilation 2/4 demands it."""

    def __init__(self, layers=(3, 4, 6), init_c=3, ret_features=False):
        super().__init__()
        self.inplanes = 64
        self.ret_features = ret_features
        self.conv1 = nn.Conv2d(init_c, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.max_pool = nn.MaxPool2d(3, 2, 1, ceil_mode=True)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], dilation=2)
        if len(layers) > 3:
            self.layer4 = self._make_layer(512, layers[3], dilation=4)

    def _make_layer(self, planes, blocks, stride=1, dilation=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4 or dilation in (2, 4):
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride,
                                  dilation, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes,
                                          dilation=dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        out = self.max_pool(self.relu(self.bn1(self.conv1(x))))
        l1 = self.layer1(out)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        if hasattr(self, "layer4"):
            l4 = self.layer4(l3)
            return (l1, l2, l3, l4) if self.ret_features else l4
        return (l1, l2, l3) if self.ret_features else l3


class TorchASPP(nn.Module):
    """Reference ASPP (backbones.py:279-321); Dropout2d -> Identity
    (eval)."""

    def __init__(self, inc=256, midc=256, outc=512, tail=True):
        super().__init__()

        def br(ksize, pad, dil):
            return nn.Sequential(
                nn.Conv2d(inc, midc, ksize, padding=pad, dilation=dil,
                          bias=True),
                nn.ReLU(), nn.Identity())

        self.aspp_0 = br(1, 0, 1)
        self.aspp_1 = br(1, 0, 1)
        self.aspp_2 = br(3, 6, 6)
        self.aspp_3 = br(3, 12, 12)
        self.aspp_4 = br(3, 18, 18)
        if tail:
            self.layer6 = nn.Conv2d(midc * 5, outc, 1, bias=True)

    def forward(self, x):
        g = F.adaptive_avg_pool2d(x, (1, 1))
        g = self.aspp_0(g).expand(-1, -1, *x.shape[-2:])
        out = torch.cat((g, self.aspp_1(x), self.aspp_2(x),
                         self.aspp_3(x), self.aspp_4(x)), dim=1)
        if hasattr(self, "layer6"):
            out = self.layer6(out)
        return out


class TorchASPPV2(nn.Module):
    """Reference ASPPV2 (backbones.py:324-369): per-branch
    BN -> DropBlock(Identity in eval) -> Conv -> ReLU, then layer6."""

    def __init__(self, inc=256, midc=256, outc=512):
        super().__init__()

        def br(ksize, pad, dil):
            return nn.Sequential(
                nn.BatchNorm2d(inc), nn.Identity(),
                nn.Conv2d(inc, midc, ksize, padding=pad, dilation=dil,
                          bias=True),
                nn.ReLU())

        self.aspp_0 = br(1, 0, 1)
        self.aspp_1 = br(1, 0, 1)
        self.aspp_2 = br(3, 6, 6)
        self.aspp_3 = br(3, 12, 12)
        self.aspp_4 = br(3, 18, 18)
        self.layer6 = nn.Conv2d(midc * 5, outc, 1, bias=True)

    def forward(self, x):
        g = F.adaptive_avg_pool2d(x, (1, 1))
        g = self.aspp_0(g).expand(-1, -1, *x.shape[-2:])
        out = torch.cat((g, self.aspp_1(x), self.aspp_2(x),
                         self.aspp_3(x), self.aspp_4(x)), dim=1)
        return self.layer6(out)


def purifier_v2(out_channels=512):
    """Reference stage-1 purifier Sequential (pemp_stage1.py:73-80);
    DropBlock slots (indices 2, 5) -> Identity for eval parity."""
    return nn.Sequential(
        nn.Conv2d(1024, 256, 1, bias=True), nn.ReLU(), nn.Identity(),
        nn.Conv2d(256, 256, 3, padding=1, bias=True), nn.ReLU(),
        nn.Identity(),
        TorchASPPV2(256, 256, out_channels))


class TorchPEMPStage1(nn.Module):
    """Reference PEMPStage1, ResNet-50 encoder (pemp_stage1.py:54-262)."""

    def __init__(self, protos=3, out_channels=512, dist_scalar=20.0):
        super().__init__()
        self.encoder = nn.Sequential(OrderedDict([
            ("backbone", TorchResNet((3, 4, 6))),
            ("purifier", purifier_v2(out_channels)),
        ]))
        self.protos = protos
        self.dist_scalar = dist_scalar
        self.ctr = nn.Parameter(torch.rand(out_channels, protos * 2)) \
            if protos > 0 else None

    def forward(self, sup_img, sup_mask, qry_img, out_shape=None,
                ret_ind=False):
        B, S, channel, H, W = sup_img.size()
        Q = qry_img.size(1)
        img_cat = torch.cat((sup_img, qry_img), dim=1) \
            .view(B * (S + Q), channel, H, W)
        features = self.encoder(img_cat)
        _, c, h, w = features.size()
        features = features.view(B, S + Q, c, h, w)
        sup_fts, qry_fts = features[:, :S], features[:, S:]
        m = sup_mask.view(B * S, 2, H, W)
        m = F.interpolate(m, (h, w), mode="nearest")
        sup_fg, sup_bg = m.unbind(dim=1)

        pred = self.mpm(sup_fts, qry_fts, sup_fg, sup_bg, ret_ind)
        if out_shape is None:
            out_shape = (H, W)
        if ret_ind:
            pred, response = pred
            out = F.interpolate(pred, out_shape, mode="bilinear",
                                align_corners=True)
            response = F.interpolate(response.unsqueeze(1).float(),
                                     out_shape, mode="nearest")
            return out, response.squeeze(1).long()
        return F.interpolate(pred, out_shape, mode="bilinear",
                             align_corners=True)

    def mpm(self, sup_fts, qry_fts, sup_fg, sup_bg, ret_ind=False):
        """Reference mpm (pemp_stage1.py:165-230)."""
        B, S, c, h, w = sup_fts.shape
        p = self.protos
        sup_fts = sup_fts.reshape(-1, c, h * w)
        qry_fts = qry_fts.reshape(-1, c, 1, h, w)
        sup_fg = sup_fg.view(-1, 1, h * w)
        sup_bg = sup_bg.view(-1, 1, h * w)

        if self.ctr is not None:
            ctr = self.ctr.view(1, c, p * 2)
            mask = torch.stack((sup_fg, sup_bg), dim=1)       # [BS,2,1,hw]
            D = -((sup_fts.unsqueeze(2) - ctr.unsqueeze(3)) ** 2).sum(dim=1)
            D = D.view(-1, 2, p, h * w)
            D = (torch.softmax(D, dim=2) * mask).view(-1, 1, p * 2, h * w)
            masked = sup_fts.view(-1, c, 1, h * w) * D
            ctr = (masked.sum(dim=3) / (D.sum(dim=3) + 1e-6)) \
                .view(B, S, c, 2, p)
            ctr = ctr.transpose(3, 4).reshape(B, S, c * p, 2).mean(dim=1)
            fg_proto, bg_proto = ctr.view(B, c, p, 2).unbind(dim=3)
            max_v = self.compute_similarity(fg_proto, bg_proto,
                                            qry_fts).max(dim=2)
            pred = max_v.values
            if ret_ind:
                ind = max_v.indices
                response = ind[:, 0].clone()
                select = pred.argmax(dim=1) == 1
                response[select] = ind[:, 1][select] + p
                return pred, response
            return pred
        fg_v = (sup_fts * sup_fg).sum(-1) / (sup_fg.sum(-1) + 1e-5)
        bg_v = (sup_fts * sup_bg).sum(-1) / (sup_bg.sum(-1) + 1e-5)
        fg_proto = fg_v.view(B, S, c).mean(1)
        bg_proto = bg_v.view(B, S, c).mean(1)
        fg_d = F.cosine_similarity(
            qry_fts.view(-1, c, h, w), fg_proto[..., None, None],
            dim=1) * self.dist_scalar
        bg_d = F.cosine_similarity(
            qry_fts.view(-1, c, h, w), bg_proto[..., None, None],
            dim=1) * self.dist_scalar
        return torch.stack((bg_d, fg_d), dim=1)

    def compute_similarity(self, fg_proto, bg_proto, qry_fts):
        """Reference compute_similarity (pemp_stage1.py:232-262):
        protos [B, c, p], qry_fts [BQ, c, 1, h, w]."""
        fg_d = F.cosine_similarity(
            qry_fts, fg_proto[..., None, None], dim=1) * self.dist_scalar
        bg_d = F.cosine_similarity(
            qry_fts, bg_proto[..., None, None], dim=1) * self.dist_scalar
        return torch.stack((bg_d, fg_d), dim=1)      # [BQ, 2, p, h, w]


class TorchCaNet(nn.Module):
    """Reference CaNet (canet.py:25-231): dense comparison + history-mask
    residual refinement + ASPP; Dropout2d slots -> Identity (eval)."""

    def __init__(self, use_history=True, num_classes=2):
        super().__init__()
        self.use_history = use_history
        self.encoder = TorchResNet((3, 4, 6), ret_features=True)

        def crd(inc, outc, k, pad, dil):
            return nn.Sequential(
                nn.Conv2d(inc, outc, k, padding=pad, dilation=dil,
                          bias=True),
                nn.ReLU(), nn.Identity())

        self.layer5 = crd(512 + 1024, 256, 3, 2, 2)
        self.layer55 = crd(512, 256, 3, 2, 2)
        self.aspp_0 = crd(256, 256, 1, 0, 1)
        self.aspp_1 = crd(256, 256, 1, 0, 1)
        self.aspp_2 = crd(256, 256, 3, 6, 6)
        self.aspp_3 = crd(256, 256, 3, 12, 12)
        self.aspp_4 = crd(256, 256, 3, 18, 18)
        self.layer6 = crd(1280, 256, 1, 0, 1)
        res_in = 256 + 2 if use_history else 256

        def res(inc):
            return nn.Sequential(
                nn.ReLU(), nn.Conv2d(inc, 256, 3, padding=1, bias=True),
                nn.ReLU(), nn.Conv2d(256, 256, 3, padding=1, bias=True))

        self.residual_1 = res(res_in)
        self.residual_2 = res(256)
        self.residual_3 = res(256)
        self.layer7 = nn.Conv2d(256, num_classes, 1, bias=True)

    def forward(self, sup_img, sup_mask, qry_img, history_mask,
                out_shape=None):
        B, S, channel, H, W = sup_img.size()
        Q = qry_img.size(1)
        img_cat = torch.cat((sup_img, qry_img), dim=1) \
            .view(B * (S + Q), channel, H, W)
        f1, f2, f3 = self.encoder(img_cat)

        feat = self.layer5(torch.cat((f2, f3), dim=1))
        _, c, h, w = feat.size()
        feat = feat.view(B, S + Q, c, h, w)
        sup_fts = feat[:, :S].reshape(B * S, c, h, w)
        qry_fts = feat[:, S:].reshape(B * Q, c, h, w)

        m = sup_mask[:, :, 0].view(B * S, 1, H, W)
        m = F.interpolate(m, (h, w), mode="nearest")
        z = (sup_fts * m).sum((2, 3)) / (m.sum((2, 3)) + 1e-5)
        z = z.view(B, S, c).mean(dim=1)
        z = z.view(B, 1, c, 1, 1).repeat(1, Q, 1, h, w) \
            .view(B * Q, c, h, w)
        out = self.layer55(torch.cat((qry_fts, z), dim=1))
        out = self.res_aspp(out, history_mask)
        out = self.layer7(out)
        if out_shape is not False:
            if out_shape is None:
                out_shape = (H, W)
            out = F.interpolate(out, out_shape, mode="bilinear",
                                align_corners=True)
        return out

    def res_aspp(self, features, history_mask):
        out = features
        _, _, h, w = features.size()
        history_mask = history_mask.view(-1, *history_mask.shape[-3:])
        out_2 = torch.cat((out, history_mask), dim=1) \
            if self.use_history else out
        out = out + self.residual_1(out_2)
        out = out + self.residual_2(out)
        out = out + self.residual_3(out)
        g = F.avg_pool2d(out, (h, w))
        g = self.aspp_0(g).expand(-1, -1, h, w)
        out = torch.cat((g, self.aspp_1(out), self.aspp_2(out),
                         self.aspp_3(out), self.aspp_4(out)), dim=1)
        return self.layer6(out)


class TorchPMMs(nn.Module):
    """Reference PMMs (rpmms.py:28-141) with an injectable mu init; the
    SAME mu seeds both the fg and bg EM."""

    def __init__(self, k, mu, stage_num=10, kappa=20.0):
        super().__init__()
        self.k, self.mu, self.stage_num, self.kappa = k, mu, stage_num, kappa

    def _l2norm(self, x, dim):
        return x / (1e-6 + x.norm(dim=dim, keepdim=True))

    def em(self, x):
        b = x.shape[0]
        mu = self.mu.repeat(b, 1, 1)
        with torch.no_grad():
            for _ in range(self.stage_num):
                z = self.kappa * torch.bmm(x.permute(0, 2, 1), mu)
                z = F.softmax(z, dim=2)
                z_ = z / (1e-6 + z.sum(dim=1, keepdim=True))
                mu = self._l2norm(torch.bmm(x, z_), dim=1)
        return mu.permute(0, 2, 1)                       # [b, k, c]

    def forward(self, support_feature, support_mask, query_feature):
        mask = F.interpolate(support_mask, support_feature.shape[-2:],
                             mode="bilinear", align_corners=True)
        b, c, h, w = support_feature.size()
        mu_f = self.em((mask * support_feature).view(b, c, h * w))
        mu_b = self.em(((1 - mask) * support_feature).view(b, c, h * w))
        vec_pos = [mu_f[:, i, :].unsqueeze(2).unsqueeze(3)
                   for i in range(self.k)]
        # discriminative model (rpmms.py:119-141)
        mu = torch.cat([mu_f, mu_b], dim=1).permute(0, 2, 1)
        bq, c, h, w = query_feature.size()
        x = query_feature.view(bq, c, h * w)
        with torch.no_grad():
            z = F.softmax(torch.bmm(x.permute(0, 2, 1), mu), dim=2)
        P = z.permute(0, 2, 1).view(bq, self.k * 2, h, w)
        p_f = P[:, :self.k].sum(dim=1, keepdim=True)
        p_b = P[:, self.k:].sum(dim=1, keepdim=True)
        return vec_pos, torch.cat([p_b, p_f], dim=1)


class TorchRPMMs(nn.Module):
    """Reference RPMMs (rpmms.py:144-287): residual 3-scale prototype
    pyramid; Dropout2d slots -> Identity (eval)."""

    def __init__(self, mu_inits):
        super().__init__()
        self.num_pro_list = (1, 3, 6)
        self.mu_inits = mu_inits      # [1, 256, k] per scale
        self.model_res = TorchResNet((3, 4, 6), ret_features=True)
        self.layer5 = nn.Sequential(
            nn.Conv2d(1536, 256, 3, padding=2, dilation=2, bias=True),
            nn.BatchNorm2d(256), nn.ReLU())
        self.layer55 = nn.Sequential(
            nn.Conv2d(512, 256, 3, padding=2, dilation=2, bias=True),
            nn.ReLU(), nn.Identity())
        self.layer56 = nn.Sequential(
            nn.Conv2d(258, 256, 3, padding=1, bias=True),
            nn.ReLU(), nn.Identity())
        self.layer6 = TorchASPP(256, 256, tail=False)
        self.layer7 = nn.Sequential(
            nn.Conv2d(1280, 256, 1, bias=True), nn.ReLU(), nn.Identity())
        self.layer9 = nn.Conv2d(256, 2, 1, bias=True)

        def res(inc):
            return nn.Sequential(
                nn.ReLU(), nn.Conv2d(inc, 256, 3, padding=1, bias=True),
                nn.ReLU(), nn.Conv2d(256, 256, 3, padding=1, bias=True))

        self.residule1 = res(258)
        self.residule2 = res(256)
        self.residule3 = res(256)

    def extract_feature_res(self, rgb):
        _, f2, f3 = self.model_res(rgb)
        return self.layer5(torch.cat([f2, f3], dim=1))

    def segmentation(self, feature, history_mask):
        history_mask = F.interpolate(history_mask, feature.shape[-2:],
                                     mode="bilinear", align_corners=True)
        out = feature
        out = out + self.residule1(torch.cat([feature, history_mask],
                                             dim=1))
        out = out + self.residule2(out)
        out = out + self.residule3(out)
        out = self.layer9(self.layer7(self.layer6(out)))
        return out, F.softmax(out, dim=1)

    def forward(self, sup_img, sup_mask, qry_img):
        B, S, channel, H, W = sup_img.size()
        Q = qry_img.size(1)
        query_rgb = qry_img.view(B * Q, channel, H, W)
        support_rgb = sup_img.view(B * S, channel, H, W)
        support_mask = sup_mask.view(B * S, 2, H, W)[:, :1]
        support_feature = self.extract_feature_res(support_rgb)
        query_feature = self.extract_feature_res(query_rgb)
        feature_size = query_feature.shape[-2:]

        pseudo = torch.zeros(B, 2, *feature_size)
        out_list = []
        for num, mu in zip(self.num_pro_list, self.mu_inits):
            pmms = TorchPMMs(num, mu)
            vec_pos, prob_map = pmms(support_feature, support_mask,
                                     query_feature)
            feat = None
            for vec in vec_pos:
                x = self.layer55(torch.cat(
                    [query_feature,
                     vec.expand(-1, -1, *feature_size)], dim=1))
                feat = x if feat is None else feat + x
            feat = self.layer56(torch.cat([feat, prob_map], dim=1))
            out, pseudo = self.segmentation(feat, pseudo)
            out_list.append(out)
        return tuple(out_list)


class TorchBottleneckV2(nn.Module):
    """torchvision-style bottleneck (pfe_resent.py:60-93): stride and
    dilation on conv2."""

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


def _v2_layer(inplanes, planes, blocks, stride=1, dilation=1):
    """pfe_resent _make_layer + the PFENet dilation surgery
    (pfenet.py:68-77): stride folded into dilation for layers 3/4."""
    downsample = None
    if stride != 1 or inplanes != planes * 4 or dilation in (2, 4):
        downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4))
    layers = [TorchBottleneckV2(inplanes, planes, stride, dilation,
                                downsample)]
    for _ in range(1, blocks):
        layers.append(TorchBottleneckV2(planes * 4, planes,
                                        dilation=dilation))
    return nn.Sequential(*layers)


class TorchPFENet(nn.Module):
    """Reference PFENet (pfenet.py:52-287): deep-base ResNet-v2 frozen
    trunk, training-free prior, feature enrichment pyramid. Dropout2d
    slots -> Identity (eval); state_dict keys match a reference-trained
    checkpoint (layer0.* stem grouping etc.)."""

    def __init__(self, shot=1, pyramid_bins=(60, 30, 15, 8)):
        super().__init__()
        self.shot = shot
        self.pyramid_bins = list(pyramid_bins)
        # deep-base stem (pfe_resent.py:108-118) grouped like pfenet.py:64
        self.layer0 = nn.Sequential(
            nn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(),
            nn.Conv2d(64, 64, 3, padding=1, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(),
            nn.Conv2d(64, 128, 3, padding=1, bias=False),
            nn.BatchNorm2d(128), nn.ReLU(),
            nn.MaxPool2d(3, 2, 1))
        self.layer1 = _v2_layer(128, 64, 3)
        self.layer2 = _v2_layer(256, 128, 4, stride=2)
        self.layer3 = _v2_layer(512, 256, 6, stride=1, dilation=2)
        self.layer4 = _v2_layer(1024, 512, 3, stride=1, dilation=4)

        reduce_dim, fea_dim, classes = 256, 1024 + 512, 2
        self.cls = nn.Sequential(
            nn.Conv2d(reduce_dim, reduce_dim, 3, padding=1, bias=False),
            nn.ReLU(), nn.Identity(),
            nn.Conv2d(reduce_dim, classes, 1))
        self.down_query = nn.Sequential(
            nn.Conv2d(fea_dim, reduce_dim, 1, bias=False),
            nn.ReLU(), nn.Identity())
        self.down_supp = nn.Sequential(
            nn.Conv2d(fea_dim, reduce_dim, 1, bias=False),
            nn.ReLU(), nn.Identity())
        self.init_merge = nn.ModuleList([
            nn.Sequential(nn.Conv2d(reduce_dim * 2 + 1, reduce_dim, 1,
                                    bias=False), nn.ReLU())
            for _ in self.pyramid_bins])
        self.beta_conv = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(reduce_dim, reduce_dim, 3, padding=1,
                          bias=False), nn.ReLU(),
                nn.Conv2d(reduce_dim, reduce_dim, 3, padding=1,
                          bias=False), nn.ReLU())
            for _ in self.pyramid_bins])
        self.inner_cls = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(reduce_dim, reduce_dim, 3, padding=1,
                          bias=False), nn.ReLU(), nn.Identity(),
                nn.Conv2d(reduce_dim, classes, 1))
            for _ in self.pyramid_bins])
        self.res1 = nn.Sequential(
            nn.Conv2d(reduce_dim * len(self.pyramid_bins), reduce_dim, 1,
                      bias=False), nn.ReLU())
        self.res2 = nn.Sequential(
            nn.Conv2d(reduce_dim, reduce_dim, 3, padding=1, bias=False),
            nn.ReLU(),
            nn.Conv2d(reduce_dim, reduce_dim, 3, padding=1, bias=False),
            nn.ReLU())
        self.alpha_conv = nn.ModuleList([
            nn.Sequential(nn.Conv2d(512, 256, 1, bias=False), nn.ReLU())
            for _ in range(len(self.pyramid_bins) - 1)])

    def forward(self, sup_img, sup_mask, qry_img):
        """Eval forward returning (out, aux_outs) at query-feature res is
        inconvenient — follow the reference and return input-res out plus
        per-scale aux logits (the reference returns aux only in training;
        the math is identical)."""
        x = qry_img.squeeze(1)
        s_x = sup_img
        s_y = sup_mask[:, :, 0]
        H, W = x.shape[-2:]

        with torch.no_grad():
            q0 = self.layer0(x)
            q1 = self.layer1(q0)
            q2 = self.layer2(q1)
            q3 = self.layer3(q2)
            q4 = self.layer4(q3)
        query_feat = self.down_query(torch.cat([q3, q2], 1))

        supp_feat_list, final_supp_list, mask_list = [], [], []
        for i in range(self.shot):
            mask = (s_y[:, i] == 1).float().unsqueeze(1)
            mask_list.append(mask)
            with torch.no_grad():
                s0 = self.layer0(s_x[:, i])
                s1 = self.layer1(s0)
                s2 = self.layer2(s1)
                s3 = self.layer3(s2)
                m = F.interpolate(mask, size=s3.shape[-2:],
                                  mode="bilinear", align_corners=True)
                s4 = self.layer4(s3 * m)
                final_supp_list.append(s4)
            sf = self.down_supp(torch.cat([s3, s2], 1))
            # Weighted_GAP (pfenet.py:15-20)
            fh, fw = sf.shape[-2:]
            area = F.avg_pool2d(m, (fh, fw)) * fh * fw + 0.0005
            supp_feat_list.append(
                F.avg_pool2d(sf * m, sf.shape[-2:]) * fh * fw / area)

        cosine_eps = 1e-7
        corr_list = []
        for i, ts in enumerate(final_supp_list):
            rs = ts.size(2)
            tm = F.interpolate(mask_list[i], size=(rs, rs),
                               mode="bilinear", align_corners=True)
            s = ts * tm
            bsz, ch, sp, _ = q4.size()
            tq = q4.contiguous().view(bsz, ch, -1)
            tqn = torch.norm(tq, 2, 1, True)
            tsf = s.contiguous().view(bsz, ch, -1).permute(0, 2, 1)
            tsn = torch.norm(tsf, 2, 2, True)
            sim = torch.bmm(tsf, tq) / (torch.bmm(tsn, tqn) + cosine_eps)
            sim = sim.max(1)[0].view(bsz, sp * sp)
            sim = (sim - sim.min(1)[0].unsqueeze(1)) / (
                sim.max(1)[0].unsqueeze(1)
                - sim.min(1)[0].unsqueeze(1) + cosine_eps)
            corr = sim.view(bsz, 1, sp, sp)
            corr = F.interpolate(corr, size=q3.shape[-2:],
                                 mode="bilinear", align_corners=True)
            corr_list.append(corr)
        corr_query_mask = torch.cat(corr_list, 1).mean(1).unsqueeze(1)
        corr_query_mask = F.interpolate(
            corr_query_mask, size=query_feat.shape[-2:], mode="bilinear",
            align_corners=True)

        supp_feat = supp_feat_list[0]
        for i in range(1, len(supp_feat_list)):
            supp_feat = supp_feat + supp_feat_list[i]
        supp_feat = supp_feat / len(supp_feat_list)

        out_list, pyr_list = [], []
        for idx, bin_ in enumerate(self.pyramid_bins):
            qb = F.adaptive_avg_pool2d(query_feat, bin_)
            sb = supp_feat.expand(-1, -1, bin_, bin_)
            cb = F.interpolate(corr_query_mask, size=(bin_, bin_),
                               mode="bilinear", align_corners=True)
            mb = self.init_merge[idx](torch.cat([qb, sb, cb], 1))
            if idx >= 1:
                pre = F.interpolate(pyr_list[idx - 1].clone(),
                                    size=(bin_, bin_), mode="bilinear",
                                    align_corners=True)
                mb = self.alpha_conv[idx - 1](
                    torch.cat([mb, pre], 1)) + mb
            mb = self.beta_conv[idx](mb) + mb
            out_list.append(self.inner_cls[idx](mb))
            pyr_list.append(F.interpolate(
                mb, size=query_feat.shape[-2:], mode="bilinear",
                align_corners=True))

        qf = self.res1(torch.cat(pyr_list, 1))
        qf = self.res2(qf) + qf
        out = self.cls(qf)
        out = F.interpolate(out, size=(H, W), mode="bilinear",
                            align_corners=True)
        aux = [F.interpolate(o, size=(H, W), mode="bilinear",
                             align_corners=True) for o in out_list]
        return out, aux


def torch_vgg16(init=3, last_relu=False):
    """Reference VGG16 trunk (backbones.py:372-405): pool4 stride 1,
    conv5 dilation 2, lastRelu optional."""
    layers = [
        nn.Conv2d(init, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 1, 1),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2),
    ]
    if last_relu:
        layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def vgg16_torchvision_sd(trunk):
    """Export a torch_vgg16 trunk as a torchvision ``features.*`` state
    dict (the layout our converter consumes)."""
    conv_idx = [i for i, m in enumerate(trunk) if isinstance(m, nn.Conv2d)]
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    for tvi, i in zip(tv_idx, conv_idx):
        sd[f"features.{tvi}.weight"] = trunk[i].weight.detach().numpy()
        sd[f"features.{tvi}.bias"] = trunk[i].bias.detach().numpy()
    return sd


class TorchPANet(nn.Module):
    """Reference PANet, VGG16 encoder (panet.py:38-194): baseline
    prototypes from mask-size-upsampled support features + the prototype
    alignment branch."""

    def __init__(self, dist_scalar=20.0):
        super().__init__()
        self.encoder = torch_vgg16()
        self.dist_scalar = dist_scalar

    def forward(self, sup_img, sup_mask, qry_img, out_shape=None):
        B, S, C, H, W = sup_img.size()
        Q = qry_img.size(1)
        img_cat = torch.cat((sup_img, qry_img), dim=1) \
            .view(B * (S + Q), C, H, W)
        features = self.encoder(img_cat)
        _, c, h, w = features.size()
        features = features.view(B, S + Q, c, h, w)
        sup_fts = features[:, :S].reshape(B * S, c, h, w)
        qry_fts = features[:, S:].reshape(B * Q, c, h, w)
        sup_up = F.interpolate(sup_fts, (H, W), mode="bilinear",
                               align_corners=True)
        m = sup_mask.view(B * S, 2, H, W)
        fg, bg = m.split(1, dim=1)
        fg_v = (sup_up * fg).sum((2, 3)) / (fg.sum((2, 3)) + 1e-5)
        bg_v = (sup_up * bg).sum((2, 3)) / (bg.sum((2, 3)) + 1e-5)
        fg_proto = fg_v.view(B, S, -1).mean(1)
        bg_proto = bg_v.view(B, S, -1).mean(1)

        pred = self.compute_similarity(fg_proto, bg_proto, qry_fts)
        if out_shape is None:
            out_shape = (H, W)
        output = F.interpolate(pred, out_shape, mode="bilinear",
                               align_corners=True)
        align_loss = self.align_loss(qry_fts, pred, sup_fts, fg, Q)
        return output, align_loss

    def compute_similarity(self, fg_proto, bg_proto, qry_fts):
        if qry_fts.shape[0] // fg_proto.shape[0] != 1:
            Q = qry_fts.shape[0] // fg_proto.shape[0]
            B, c = fg_proto.size()
            fg_proto = fg_proto.view(B, 1, c).expand(-1, Q, -1) \
                .reshape(B * Q, c)
            bg_proto = bg_proto.view(B, 1, c).expand(-1, Q, -1) \
                .reshape(B * Q, c)
        fg_d = F.cosine_similarity(
            qry_fts, fg_proto[..., None, None], dim=1) * self.dist_scalar
        bg_d = F.cosine_similarity(
            qry_fts, bg_proto[..., None, None], dim=1) * self.dist_scalar
        return torch.stack((bg_d, fg_d), dim=1)

    def align_loss(self, qry_fts, pred, sup_fts, sup_mask_fg, Q):
        """Reference alignLoss (panet.py:158-194)."""
        B = qry_fts.size(0) // Q
        c = qry_fts.size(1)
        pred_mask = pred.argmax(dim=1, keepdim=True)
        qfg = (pred_mask == 1).float()
        qbg = (pred_mask == 0).float()
        fg_p = (qry_fts * qfg).sum((2, 3)) / (qfg.sum((2, 3)) + 1e-5)
        bg_p = (qry_fts * qbg).sum((2, 3)) / (qbg.sum((2, 3)) + 1e-5)
        fg_p = fg_p.view(B, Q, c).mean(1)
        bg_p = bg_p.view(B, Q, c).mean(1)
        pred = self.compute_similarity(fg_p, bg_p, sup_fts)
        out = F.interpolate(pred, sup_mask_fg.shape[-2:],
                            mode="bilinear", align_corners=True)
        return F.cross_entropy(out, sup_mask_fg.squeeze(1).long())


class TorchResNetCM(nn.Module):
    """Reference ResNetCM (backbones.py:160-276): 3-stage dilated trunk
    with episode communication modules; the first block of every stage
    consumes +n CM channels; comm strides 2 / 1 / 2."""

    def __init__(self, layers=(3, 4, 6), init_c=4, spq=2, n=2):
        super().__init__()
        self.inplanes = 64
        self.spq = spq
        self.conv1 = nn.Conv2d(init_c, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.max_pool = nn.MaxPool2d(3, 2, 1, ceil_mode=True)
        self.layer1 = self._make_layer(64, layers[0], n=n)
        self.layer2 = self._make_layer(128, layers[1], stride=2, n=n)
        self.layer3 = self._make_layer(256, layers[2], dilation=2, n=n)
        self.linear1 = nn.Linear(2 * 64, n)
        self.linear2 = nn.Linear(2 * 256, n)
        self.linear3 = nn.Linear(2 * 512, n)

    def _make_layer(self, planes, blocks, stride=1, dilation=1, n=2):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4 or dilation in (2, 4):
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes + n, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes + n, planes, stride,
                                  dilation, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes,
                                          dilation=dilation))
        return nn.Sequential(*layers)

    def comm(self, x, mask, linear, stride=2):
        mask = F.max_pool2d(mask, 3, stride, 1)
        masked = (x * mask).view(*x.shape[:2], -1)
        mean = masked.mean(dim=-1)
        mean = mean.view(x.shape[0] // self.spq, self.spq, -1).mean(dim=1)
        mx = masked.max(dim=-1)[0]
        mx = mx.view(x.shape[0] // self.spq, self.spq, -1).mean(dim=1)
        feat = linear(torch.cat([mean, mx], dim=1))
        feat = feat.unsqueeze(1).unsqueeze(-1).unsqueeze(-1) \
            .expand(-1, self.spq, -1, *x.shape[-2:])
        return feat.reshape(x.shape[0], -1, *x.shape[-2:]), mask

    def forward(self, x):
        x, mask = x
        mask = F.max_pool2d(mask, 3, 2, 1)
        x1 = self.max_pool(self.relu(self.bn1(self.conv1(x))))
        ci, mask = self.comm(x1, mask, self.linear1)
        x2 = self.layer1(torch.cat([x1, ci], dim=1))
        ci, mask = self.comm(x2, mask, self.linear2, stride=1)
        x3 = self.layer2(torch.cat([x2, ci], dim=1))
        ci, mask = self.comm(x3, mask, self.linear3)
        return self.layer3(torch.cat([x3, ci], dim=1))


def purifier_v1(out_channels=512):
    """Reference stage-2 purifier (pemp_stage2.py:66-73); Dropout2d
    slots (indices 2, 5) -> Identity for eval parity."""
    return nn.Sequential(
        nn.Conv2d(1024, 256, 1, bias=True), nn.ReLU(), nn.Identity(),
        nn.Conv2d(256, 256, 3, padding=1, bias=True), nn.ReLU(),
        nn.Identity(),
        TorchASPP(256, 256, out_channels))


class TorchPEMPStage2(TorchPEMPStage1):
    """Reference PEMPStage2, ResNetCM encoder (pemp_stage2.py:42-230).
    Inherits the identical mpm / compute_similarity from stage 1."""

    def __init__(self, protos=3, out_channels=512, dist_scalar=20.0,
                 spq=2):
        nn.Module.__init__(self)
        self.encoder = nn.Sequential(OrderedDict([
            ("backbone", TorchResNetCM((3, 4, 6), init_c=4, spq=spq)),
            ("purifier", purifier_v1(out_channels)),
        ]))
        self.protos = protos
        self.dist_scalar = dist_scalar
        self.ctr = nn.Parameter(torch.rand(out_channels, protos * 2)) \
            if protos > 0 else None

    def forward(self, sup_img, sup_mask, qry_img, qry_prior,
                out_shape=None, ret_ind=False):
        B, S, channel, H, W = sup_img.size()
        Q = qry_img.size(1)
        img_cat = torch.cat((sup_img, qry_img), dim=1) \
            .view(B * (S + Q), channel, H, W)
        sup_prior = sup_mask[:, :, :1]
        qry_prior = qry_prior.view(B, Q, 1, H, W)
        prior_cat = torch.cat((sup_prior, qry_prior.float()), dim=1) \
            .view(B * (S + Q), 1, H, W)
        inputs = torch.cat((img_cat, prior_cat), dim=1)
        features = self.encoder((inputs, prior_cat))
        _, c, h, w = features.size()
        features = features.view(B, S + Q, c, h, w)
        sup_fts, qry_fts = features[:, :S], features[:, S:]
        m = sup_mask.view(B * S, 2, H, W)
        m = F.interpolate(m, (h, w), mode="nearest")
        sup_fg, sup_bg = m.unbind(dim=1)

        pred = self.mpm(sup_fts, qry_fts, sup_fg, sup_bg, ret_ind)
        if out_shape is None:
            out_shape = (H, W)
        if ret_ind:
            pred, response = pred
            out = F.interpolate(pred, out_shape, mode="bilinear",
                                align_corners=True)
            response = F.interpolate(response.unsqueeze(1).float(),
                                     out_shape, mode="nearest")
            return out, response.squeeze(1).long()
        return F.interpolate(pred, out_shape, mode="bilinear",
                             align_corners=True)


class TorchBaselineR50(nn.Module):
    """Reference Baseline, ResNet-50 encoder (baseline.py:53-61:
    Sequential(backbone=3-stage dilated ResNet, projection=1x1 conv) —
    support features upsampled to MASK size before pooling :100)."""

    def __init__(self, out_channels=512, dist_scalar=20.0):
        super().__init__()
        self.encoder = nn.Sequential(OrderedDict([
            ("backbone", TorchResNet((3, 4, 6))),
            ("projection", nn.Conv2d(1024, out_channels, 1, bias=True)),
        ]))
        self.dist_scalar = dist_scalar

    def forward(self, sup_img, sup_mask, qry_img, out_shape=None):
        B, S, C, H, W = sup_img.size()
        Q = qry_img.size(1)
        img_cat = torch.cat((sup_img, qry_img), dim=1) \
            .view(B * (S + Q), C, H, W)
        features = self.encoder(img_cat)
        _, c, h, w = features.size()
        features = features.view(B, S + Q, c, h, w)
        sup_fts = features[:, :S].reshape(B * S, c, h, w)
        qry_fts = features[:, S:].reshape(B * Q, c, h, w)
        sup_up = F.interpolate(sup_fts, (H, W), mode="bilinear",
                               align_corners=True)
        m = sup_mask.view(B * S, 2, H, W)
        fg, bg = m.split(1, dim=1)
        fg_v = (sup_up * fg).sum((2, 3)) / (fg.sum((2, 3)) + 1e-5)
        bg_v = (sup_up * bg).sum((2, 3)) / (bg.sum((2, 3)) + 1e-5)
        fg_proto = fg_v.view(B, S, -1).mean(1)
        bg_proto = bg_v.view(B, S, -1).mean(1)
        fg_d = F.cosine_similarity(
            qry_fts, fg_proto[..., None, None], dim=1) * self.dist_scalar
        bg_d = F.cosine_similarity(
            qry_fts, bg_proto[..., None, None], dim=1) * self.dist_scalar
        pred = torch.stack((bg_d, fg_d), dim=1)
        if out_shape is None:
            out_shape = (H, W)
        return F.interpolate(pred, out_shape, mode="bilinear",
                             align_corners=True)
