"""Visualization & result rendering.

Covers ``video_features_pytorch/visualisation.py`` and
``video_features_tf/mask/viz.py``:

  * ``visualize_results`` — per-frame perturbed PNGs with a mask-intensity
    marker square in the corner (visualisation.py:8-32);
  * ``find_temp_mask_dots`` / ``visualize_results_on_gradcam`` — the
    red/green per-frame mask indicator dot strip over the rendered panel
    (:67-93, :35-64): green = frame unmasked, red = masked, bright for the
    current frame;
  * ``create_image_arrays`` — the triptych ``orig | CAM-blend | perturbed``
    per frame + animated GIF (:96-130). The reference shells out to
    ImageMagick ``convert``; we write the GIF with PIL (no external tool);
  * ``PlotLearning`` — loss/accuracy/LR curves (:133-190).

Inputs are channels-last numpy arrays; clips are (T, H, W, C) RGB 0..255.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def _apply_jet(x01: np.ndarray) -> np.ndarray:
    """JET colormap heatmap (uint8 HxW in [0,1] -> HxWx3 BGR like cv2)."""
    import cv2

    return cv2.applyColorMap(np.uint8(255 * x01), cv2.COLORMAP_JET)


def visualize_results(
    orig_seq: np.ndarray,
    pert_seq: np.ndarray,
    mask: np.ndarray,
    root_dir: str,
    case: str = "0",
    mark_imgs: bool = True,
):
    """Write per-frame perturbed PNGs; the top-left 10x10 square's red
    channel encodes mask[i] (visualisation.py:8-32)."""
    from PIL import Image

    out = os.path.join(root_dir, "PerturbImgs")
    os.makedirs(out, exist_ok=True)
    pert = np.array(pert_seq, dtype=np.float32, copy=True)
    for i in range(pert.shape[0]):
        if mark_imgs:
            pert[i, :10, :10, :] = 0
            pert[i, :10, :10, 0] = float(mask[i]) * 255
        Image.fromarray(pert[i].astype(np.uint8)).save(
            os.path.join(out, f"case{case}pert{i}.png")
        )
    with open(os.path.join(out, f"case{case}.txt"), "w") as f:
        f.write(str(np.asarray(mask)))


def find_temp_mask_dots(
    image_width: int, image_height: int, mask: np.ndarray, round_up: bool = True
) -> List[dict]:
    """Dot geometry for the mask indicator strip (visualisation.py:67-93).
    channel 1 (green) = mask off, channel 0 (red) = mask on. The reference
    uses channel 2 because its panels are BGR (cv2); ours are RGB (PIL), so
    red is channel 0 — same colors in the emitted images."""
    mask = np.asarray(mask, np.float32).copy()
    n = len(mask)
    dot_width = int(image_width // (n + 4))
    dot_padding = int((image_width - dot_width * n) // n)
    dot_height = int(image_height // 20)
    dots = []
    for i in range(n):
        if round_up:
            mask[i] = 1.0 if mask[i] > 0.5 else 0.0
        dots.append(
            {
                "yStart": image_height - dot_height,
                "yEnd": image_height,
                "xStart": i * (dot_width + dot_padding),
                "xEnd": i * (dot_width + dot_padding) + dot_width,
                "channel": 1 if mask[i] == 0 else 0,
            }
        )
    return dots


def visualize_results_on_gradcam(
    panel_frames: np.ndarray,  # (T, H, W_panel, 3)
    mask: np.ndarray,
    root_dir: str,
    case: str = "0",
    image_width: int = 224,
    image_height: int = 224,
    dot_offset: Optional[int] = None,
):
    """Overlay the mask dot strip on the third (perturbed) panel column and
    save per-frame PNGs (visualisation.py:35-64)."""
    from PIL import Image

    os.makedirs(root_dir, exist_ok=True)
    frames = np.array(panel_frames, dtype=np.float32, copy=True)
    dots = find_temp_mask_dots(image_width, image_height, mask)
    off = dot_offset if dot_offset is not None else image_width * 2
    t = frames.shape[0]
    for i in range(t):
        for j, dot in enumerate(dots):
            intensity = 255 if i == j else 150
            ys = dot["yStart"]
            frames[i, ys:, off + dot["xStart"] : off + dot["xEnd"], :] = 0
            frames[i, ys:, off + dot["xStart"] : off + dot["xEnd"], dot["channel"]] = (
                intensity
            )
        Image.fromarray(frames[i].astype(np.uint8)).save(
            os.path.join(root_dir, f"case{case}_{i}.png")
        )
    with open(os.path.join(root_dir, f"MASKVALScase{case}.txt"), "w") as f:
        f.write(str(np.asarray(mask)))
    return frames


def create_image_arrays(
    input_clip: np.ndarray,  # (T, H, W, 3) RGB 0..255
    gradcam_mask: np.ndarray,  # (T, H, W) in [0, 1]
    time_mask: np.ndarray,  # (T,)
    perturbed_clip: np.ndarray,  # (T, H, W, 3) snapped-mask perturbation
    output_folder: str,
    case_tag: str = "freeze",
    resize_to: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Per-frame triptych ``orig | cam-blend | perturbed`` + GIF
    (visualisation.py:96-130). Returns the (T, H, 3W, 3) panel array."""
    import cv2
    from PIL import Image

    os.makedirs(output_folder, exist_ok=True)
    t, h, w = input_clip.shape[:3]
    panels = []
    for i in range(t):
        img = input_clip[i].astype(np.float32)
        heatmap = _apply_jet(gradcam_mask[i])[:, :, ::-1]  # BGR->RGB
        perturbed = perturbed_clip[i].astype(np.float32)
        if resize_to is not None:
            img = cv2.resize(img, tuple(resize_to))
            heatmap = cv2.resize(heatmap, tuple(resize_to))
            # the reference forgets the perturbed panel (visualisation.py:
            # 96-130 resizes only img+heatmap) and would crash on the
            # concatenate below — fixed per the SURVEY §2.4 policy
            perturbed = cv2.resize(perturbed, tuple(resize_to))
        cam = heatmap.astype(np.float32) + img
        cam = cam / cam.max()
        panel = np.concatenate(
            [
                img.astype(np.uint8),
                (255 * cam).astype(np.uint8),
                perturbed.astype(np.uint8),
            ],
            axis=1,
        )
        panels.append(panel)
        cv2.imwrite(
            os.path.join(output_folder, "img%02d.jpg" % (i + 1)),
            panel[:, :, ::-1],
        )
    # GIF via PIL (reference uses ImageMagick convert, visualisation.py:123)
    ims = [Image.fromarray(p) for p in panels]
    ims[0].save(
        os.path.join(output_folder, "mygif.gif"),
        save_all=True,
        append_images=ims[1:],
        duration=100,
        loop=0,
    )
    panel_arr = np.stack(panels)
    visualize_results_on_gradcam(
        panel_arr,
        time_mask,
        root_dir=output_folder,
        case=case_tag,
        image_width=panel_arr.shape[2] // 3,
        image_height=panel_arr.shape[1],
    )
    return panel_arr


class PlotLearning:
    """Loss/accuracy/LR curve PNGs (visualisation.py:133-190)."""

    def __init__(self, save_path: str, num_classes: int):
        os.makedirs(save_path, exist_ok=True)
        self.accuracy: List[float] = []
        self.val_accuracy: List[float] = []
        self.losses: List[float] = []
        self.val_losses: List[float] = []
        self.learning_rates: List[float] = []
        self.save_path_loss = os.path.join(save_path, "loss_plot.png")
        self.save_path_accu = os.path.join(save_path, "accu_plot.png")
        self.save_path_lr = os.path.join(save_path, "lr_plot.png")
        self.init_loss = -np.log(1.0 / num_classes)

    def plot(self, logs: dict):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.accuracy.append(logs.get("acc"))
        self.val_accuracy.append(logs.get("val_acc"))
        self.losses.append(logs.get("loss"))
        self.val_losses.append(logs.get("val_loss"))
        self.learning_rates.append(logs.get("learning_rate"))

        fig = plt.figure(figsize=(6, 4))
        plt.ylim(0, 1)
        plt.plot(self.accuracy, label="train")
        plt.plot(self.val_accuracy, label="valid")
        bva = max(self.val_accuracy)
        plt.title(f"best_val@{self.val_accuracy.index(bva)}-{bva:.2f}")
        plt.legend()
        fig.savefig(self.save_path_accu)
        plt.close(fig)

        fig = plt.figure(figsize=(6, 4))
        plt.ylim(0, self.init_loss)
        plt.plot(self.losses, label="train")
        plt.plot(self.val_losses, label="valid")
        bvl = min(self.val_losses)
        plt.title(f"best_val@{self.val_losses.index(bvl)}-{bvl:.2f}")
        plt.legend()
        fig.savefig(self.save_path_loss)
        plt.close(fig)

        fig = plt.figure(figsize=(6, 4))
        plt.plot(self.learning_rates)
        plt.title(
            f"lr max {max(self.learning_rates):.6f} min {min(self.learning_rates):.6f}"
        )
        fig.savefig(self.save_path_lr)
        plt.close(fig)
