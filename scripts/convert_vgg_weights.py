"""Convert VGG19 weights to the .npz format read_tpu's perceptual loss
loads (``read_tpu.criterions.vgg.load_vgg_params``).

The reference auto-downloads caffe VGG weights at first use
(``READ/criterions/vgg_loss.py:32-54``); this build has no egress, so
run this script once on any machine that has torchvision (or the caffe
.pth from https://web.eecs.umich.edu/~justincj/models/vgg19-d01eb7cb.pth)
and ship the npz:

  python scripts/convert_vgg_weights.py --out vgg19_caffe.npz \
      [--torch-pth vgg19-d01eb7cb.pth | --torchvision]

Then train with ``--vgg-weights vgg19_caffe.npz``.
"""

import argparse

import numpy as np


def from_state_dict(sd, out_path):
    conv_keys = sorted(
        (k for k in sd if k.endswith(".weight")
         and getattr(sd[k], "dim", lambda: 0)() == 4),
        key=lambda k: int("".join(c for c in k if c.isdigit()) or 0))
    arrays = {}
    for i in range(13):  # through conv5_1
        w = sd[conv_keys[i]].numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        b = sd[conv_keys[i].replace(".weight", ".bias")].numpy()
        arrays[f"conv{i}_w"] = w
        arrays[f"conv{i}_b"] = b
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({len(arrays)//2} convs)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--torch-pth", default=None,
                   help="a torch VGG19 checkpoint (e.g. the caffe port)")
    p.add_argument("--torchvision", action="store_true",
                   help="use torchvision's pretrained vgg19")
    args = p.parse_args()

    import torch
    if args.torch_pth:
        sd = torch.load(args.torch_pth, map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    elif args.torchvision:
        import torchvision
        sd = torchvision.models.vgg19(weights="DEFAULT").features \
            .state_dict()
    else:
        raise SystemExit("pass --torch-pth or --torchvision")
    from_state_dict(sd, args.out)


if __name__ == "__main__":
    main()
