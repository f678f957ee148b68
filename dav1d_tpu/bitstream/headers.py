"""AV1 header structures (sequence / frame / tile / film-grain / metadata).

Pythonic equivalents of the public header structs in the reference
(include/dav1d/headers.h:203-441). Field names follow the reference where
reasonable so the parity with obu.c behavior is auditable.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


# --- enums (reference include/dav1d/headers.h) ------------------------------

class ObuType(IntEnum):
    SEQ_HDR = 1
    TD = 2
    FRAME_HDR = 3
    TILE_GRP = 4
    METADATA = 5
    FRAME = 6
    REDUNDANT_FRAME_HDR = 7
    PADDING = 15


class TxfmMode(IntEnum):
    ONLY_4X4 = 0
    LARGEST = 1
    SWITCHABLE = 2


class FilterMode(IntEnum):
    REGULAR = 0       # 8-tap
    SMOOTH = 1
    SHARP = 2
    BILINEAR = 3
    SWITCHABLE = 4


class AdaptiveBoolean(IntEnum):
    OFF = 0
    ON = 1
    ADAPTIVE = 2


class RestorationType(IntEnum):
    NONE = 0
    SWITCHABLE = 1
    WIENER = 2
    SGRPROJ = 3


class WarpedMotionType(IntEnum):
    IDENTITY = 0
    TRANSLATION = 1
    ROT_ZOOM = 2
    AFFINE = 3


class PixelLayout(IntEnum):
    I400 = 0
    I420 = 1
    I422 = 2
    I444 = 3


class FrameType(IntEnum):
    KEY = 0
    INTER = 1
    INTRA = 2   # intra-only
    SWITCH = 3


def frame_type_is_inter_or_switch(ft: int) -> bool:
    return bool(ft & 1)


class ColorPrimaries(IntEnum):
    BT709 = 1
    UNKNOWN = 2


class TransferCharacteristics(IntEnum):
    UNKNOWN = 2
    SRGB = 13


class MatrixCoefficients(IntEnum):
    IDENTITY = 0
    UNKNOWN = 2


class ChromaSamplePosition(IntEnum):
    UNKNOWN = 0
    VERTICAL = 1
    COLOCATED = 2


# Reference frame indices (reference src/levels.h)
NONE_REF = -1
INTRA_FRAME = 0   # within refidx arrays 0..6 are LAST..ALTREF
PRIMARY_REF_NONE = 7

MAX_TILE_COLS = 64
MAX_TILE_ROWS = 64
MAX_SEGMENTS = 8
MAX_OPERATING_POINTS = 32
MAX_CDEF_STRENGTHS = 8

INTERP_DEFAULT = FilterMode.REGULAR


# --- structures --------------------------------------------------------------

@dataclass
class OperatingPoint:
    idc: int = 0
    major_level: int = 0
    minor_level: int = 0
    initial_display_delay: int = 10
    tier: int = 0
    decoder_model_param_present: int = 0
    display_model_param_present: int = 0
    decoder_buffer_delay: int = 0
    encoder_buffer_delay: int = 0
    low_delay_mode: int = 0


@dataclass
class SequenceHeader:
    profile: int = 0
    max_width: int = 0
    max_height: int = 0
    layout: PixelLayout = PixelLayout.I420
    pri: int = ColorPrimaries.UNKNOWN
    trc: int = TransferCharacteristics.UNKNOWN
    mtrx: int = MatrixCoefficients.UNKNOWN
    chr: int = ChromaSamplePosition.UNKNOWN
    hbd: int = 0                 # 0 = 8bpc, 1 = 10bpc, 2 = 12bpc
    color_range: int = 0

    num_operating_points: int = 1
    operating_points: list = field(default_factory=list)

    still_picture: int = 0
    reduced_still_picture_header: int = 0
    timing_info_present: int = 0
    num_units_in_tick: int = 0
    time_scale: int = 0
    equal_picture_interval: int = 0
    num_ticks_per_picture: int = 0
    decoder_model_info_present: int = 0
    encoder_decoder_buffer_delay_length: int = 0
    num_units_in_decoding_tick: int = 0
    buffer_removal_delay_length: int = 0
    frame_presentation_delay_length: int = 0
    display_model_info_present: int = 0
    width_n_bits: int = 0
    height_n_bits: int = 0
    frame_id_numbers_present: int = 0
    delta_frame_id_n_bits: int = 0
    frame_id_n_bits: int = 0
    sb128: int = 0
    filter_intra: int = 0
    intra_edge_filter: int = 0
    inter_intra: int = 0
    masked_compound: int = 0
    warped_motion: int = 0
    dual_filter: int = 0
    order_hint: int = 0
    jnt_comp: int = 0
    ref_frame_mvs: int = 0
    screen_content_tools: int = AdaptiveBoolean.OFF
    force_integer_mv: int = AdaptiveBoolean.OFF
    order_hint_n_bits: int = 0
    super_res: int = 0
    cdef: int = 0
    restoration: int = 0
    ss_hor: int = 0
    ss_ver: int = 0
    monochrome: int = 0
    color_description_present: int = 0
    separate_uv_delta_q: int = 0
    film_grain_present: int = 0

    @property
    def bitdepth(self) -> int:
        return 8 + 2 * self.hbd if self.hbd < 2 else 12

    def equal_binary(self, other: "SequenceHeader") -> bool:
        """Operational equality for new-sequence detection
        (reference obu.c dav1d_parse_obus seq comparison semantics)."""
        return self == other


@dataclass
class SegmentationData:
    delta_q: int = 0
    delta_lf_y_v: int = 0
    delta_lf_y_h: int = 0
    delta_lf_u: int = 0
    delta_lf_v: int = 0
    ref: int = -1
    skip: int = 0
    globalmv: int = 0


@dataclass
class SegmentationDataSet:
    d: list = field(default_factory=lambda: [SegmentationData() for _ in range(MAX_SEGMENTS)])
    preskip: int = 0
    last_active_segid: int = -1


@dataclass
class LoopfilterModeRefDeltas:
    mode_delta: list = field(default_factory=lambda: [0, 0])
    ref_delta: list = field(default_factory=lambda: [1, 0, 0, 0, -1, 0, -1, -1])


@dataclass
class FilmGrainData:
    seed: int = 0
    num_y_points: int = 0
    y_points: list = field(default_factory=list)        # [(value, scaling)]
    chroma_scaling_from_luma: int = 0
    num_uv_points: list = field(default_factory=lambda: [0, 0])
    uv_points: list = field(default_factory=lambda: [[], []])
    scaling_shift: int = 0
    ar_coeff_lag: int = 0
    ar_coeffs_y: list = field(default_factory=list)
    ar_coeffs_uv: list = field(default_factory=lambda: [[], []])
    ar_coeff_shift: int = 0
    grain_scale_shift: int = 0
    uv_mult: list = field(default_factory=lambda: [0, 0])
    uv_luma_mult: list = field(default_factory=lambda: [0, 0])
    uv_offset: list = field(default_factory=lambda: [0, 0])
    overlap_flag: int = 0
    clip_to_restricted_range: int = 0


@dataclass
class WarpedMotionParams:
    type: int = WarpedMotionType.IDENTITY
    matrix: list = field(default_factory=lambda: [0, 0, 1 << 16, 0, 0, 1 << 16])
    alpha: int = 0
    beta: int = 0
    gamma: int = 0
    delta: int = 0

    def is_identity(self) -> bool:
        return self.type == WarpedMotionType.IDENTITY


def default_warp_params() -> WarpedMotionParams:
    return WarpedMotionParams()


@dataclass
class FrameHeaderTiling:
    uniform: int = 0
    n_bytes: int = 0
    min_log2_cols: int = 0
    max_log2_cols: int = 0
    log2_cols: int = 0
    cols: int = 0
    min_log2_rows: int = 0
    max_log2_rows: int = 0
    log2_rows: int = 0
    rows: int = 0
    col_start_sb: list = field(default_factory=list)
    row_start_sb: list = field(default_factory=list)
    update: int = 0
    min_log2: int = 0


@dataclass
class FrameHeaderQuant:
    yac: int = 0
    ydc_delta: int = 0
    udc_delta: int = 0
    uac_delta: int = 0
    vdc_delta: int = 0
    vac_delta: int = 0
    qm: int = 0
    qm_y: int = 0
    qm_u: int = 0
    qm_v: int = 0


@dataclass
class FrameHeaderSegmentation:
    enabled: int = 0
    update_map: int = 0
    temporal: int = 0
    update_data: int = 0
    seg_data: SegmentationDataSet = field(default_factory=SegmentationDataSet)
    lossless: list = field(default_factory=lambda: [0] * MAX_SEGMENTS)
    qidx: list = field(default_factory=lambda: [0] * MAX_SEGMENTS)


@dataclass
class FrameHeaderDelta:
    q_present: int = 0
    q_res_log2: int = 0
    lf_present: int = 0
    lf_res_log2: int = 0
    lf_multi: int = 0


@dataclass
class FrameHeaderLoopfilter:
    level_y: list = field(default_factory=lambda: [0, 0])
    level_u: int = 0
    level_v: int = 0
    mode_ref_delta_enabled: int = 0
    mode_ref_delta_update: int = 0
    mode_ref_deltas: LoopfilterModeRefDeltas = field(default_factory=LoopfilterModeRefDeltas)
    sharpness: int = 0


@dataclass
class FrameHeaderCdef:
    damping: int = 3
    n_bits: int = 0
    y_strength: list = field(default_factory=lambda: [0] * MAX_CDEF_STRENGTHS)
    uv_strength: list = field(default_factory=lambda: [0] * MAX_CDEF_STRENGTHS)


@dataclass
class FrameHeaderRestoration:
    type: list = field(default_factory=lambda: [RestorationType.NONE] * 3)
    unit_size: list = field(default_factory=lambda: [0, 0])


@dataclass
class FrameHeader:
    film_grain_present: int = 0
    film_grain_update: int = 0
    film_grain_data: FilmGrainData = field(default_factory=FilmGrainData)

    frame_type: int = FrameType.KEY
    width: list = field(default_factory=lambda: [0, 0])   # [final (sr), coded]
    height: int = 0
    frame_offset: int = 0
    temporal_id: int = 0
    spatial_id: int = 0

    show_existing_frame: int = 0
    existing_frame_idx: int = 0
    frame_id: int = 0
    frame_presentation_delay: int = 0
    show_frame: int = 0
    showable_frame: int = 0
    error_resilient_mode: int = 0
    disable_cdf_update: int = 0
    allow_screen_content_tools: int = 0
    force_integer_mv: int = 0
    frame_size_override: int = 0
    primary_ref_frame: int = PRIMARY_REF_NONE
    buffer_removal_time_present: int = 0
    operating_points: list = field(default_factory=list)  # buffer_removal_time per op

    refresh_frame_flags: int = 0
    render_width: int = 0
    render_height: int = 0
    super_res_enabled: int = 0
    super_res_width_scale_denominator: int = 8
    have_render_size: int = 0
    allow_intrabc: int = 0
    frame_ref_short_signaling: int = 0
    refidx: list = field(default_factory=lambda: [-1] * 7)
    hp: int = 0
    subpel_filter_mode: int = FilterMode.REGULAR
    switchable_motion_mode: int = 0
    use_ref_frame_mvs: int = 0
    refresh_context: int = 0
    tiling: FrameHeaderTiling = field(default_factory=FrameHeaderTiling)
    quant: FrameHeaderQuant = field(default_factory=FrameHeaderQuant)
    segmentation: FrameHeaderSegmentation = field(default_factory=FrameHeaderSegmentation)
    delta: FrameHeaderDelta = field(default_factory=FrameHeaderDelta)
    all_lossless: int = 0
    loopfilter: FrameHeaderLoopfilter = field(default_factory=FrameHeaderLoopfilter)
    cdef: FrameHeaderCdef = field(default_factory=FrameHeaderCdef)
    restoration: FrameHeaderRestoration = field(default_factory=FrameHeaderRestoration)
    txfm_mode: int = TxfmMode.ONLY_4X4
    switchable_comp_refs: int = 0
    skip_mode_allowed: int = 0
    skip_mode_enabled: int = 0
    skip_mode_refs: list = field(default_factory=lambda: [-1, -1])
    warp_motion: int = 0
    reduced_txtp_set: int = 0
    gmv: list = field(default_factory=lambda: [WarpedMotionParams() for _ in range(7)])


@dataclass
class ContentLightLevel:
    max_content_light_level: int = 0
    max_frame_average_light_level: int = 0


@dataclass
class MasteringDisplay:
    primaries: list = field(default_factory=lambda: [[0, 0]] * 3)
    white_point: list = field(default_factory=lambda: [0, 0])
    max_luminance: int = 0
    min_luminance: int = 0


@dataclass
class ITUTT35:
    country_code: int = 0
    country_code_extension_byte: int = 0
    payload: bytes = b""
