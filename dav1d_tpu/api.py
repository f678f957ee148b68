"""Public decoder API (push/pull contract of reference include/dav1d/dav1d.h).

Placeholder during bring-up; filled in as the pipeline lands.
"""
from dataclasses import dataclass


@dataclass
class Settings:
    """Mirrors Dav1dSettings (reference dav1d.h:78-99)."""
    n_threads: int = 0
    max_frame_delay: int = 0
    apply_grain: bool = True
    operating_point: int = 0
    all_layers: bool = True
    frame_size_limit: int = 0
    strict_std_compliance: bool = False
    output_invisible_frames: bool = False
    inloop_filters: int = 0xF
    decode_frame_type: int = 0


class Decoder:
    def __init__(self, settings: Settings | None = None):
        self.settings = settings or Settings()

    def send_data(self, data: bytes) -> None:
        raise NotImplementedError

    def get_picture(self):
        raise NotImplementedError
