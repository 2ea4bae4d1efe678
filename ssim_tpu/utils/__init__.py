from .imageio import load_image, luminance_bt601, save_map

__all__ = ["load_image", "luminance_bt601", "save_map"]
