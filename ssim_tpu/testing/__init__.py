from .frozen import (
    EINSTEIN_SUITE,
    BBB360,
    BBB1080,
    BBB255,
    BBB257,
    images_dir,
)

__all__ = ["EINSTEIN_SUITE", "BBB360", "BBB1080", "BBB255", "BBB257", "images_dir"]
