"""Dataset downloaders (parity: ``rfstudio/data/downloader/``): HuggingFace
hub pulls for the Blender-synthetic and Mip-360 bundles. Gated on network
availability — this build environment has zero egress, so the downloader
reports actionable instructions instead of failing mid-pull."""
from __future__ import annotations

import dataclasses
from pathlib import Path

_DATASETS = {
    "blender": ("nerf-synthetic", "https://huggingface.co/datasets/sxyu/nerf-synthetic"),
    "mip360": ("mip-nerf-360", "https://huggingface.co/datasets/nerfstudio/mipnerf360"),
    "synthetic4relight": ("Synthetic4Relight", "https://github.com/zju3dv/InvRender"),
    "tensoir": ("TensoIR-Synthetic", "https://github.com/Haian-Jin/TensoIR"),
    "shiny_blender": ("refnerf shiny blender", "https://storage.googleapis.com/gresearch/refraw360/ref.zip"),
}


@dataclasses.dataclass
class Downloader:
    dataset: str = "blender"
    output_dir: Path = Path("data")

    def run(self) -> Path:
        name, url = _DATASETS[self.dataset]
        target = Path(self.output_dir) / name
        if target.exists():
            return target
        try:
            import huggingface_hub  # noqa: F401
            import socket

            socket.create_connection(("huggingface.co", 443), timeout=3).close()
        except Exception as exc:
            raise RuntimeError(
                f"no network access in this environment ({exc}); fetch "
                f"'{name}' manually from {url} and place it at {target}"
            ) from exc
        from huggingface_hub import snapshot_download

        snapshot_download(
            repo_id=url.split("datasets/")[-1],
            repo_type="dataset",
            local_dir=target,
        )
        return target
