"""SPS / PPS / slice-header writers.

Reference: /root/reference/encoder/set.c (x264_sps_init:77, sps_write:215,
pps_init:368, pps_write:429) and the slice-header writer in
encoder/encoder.c (x264_slice_header_init / x264_slice_header_write).
Baseline-profile subset: CAVLC, frame_mbs_only, poc_type 2 (decode order
== display order, valid for IPPP), single slice per frame.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..utils.bitstream import BitWriter

PROFILE_BASELINE = 66
PROFILE_MAIN = 77
PROFILE_HIGH = 100

SLICE_TYPE_P = 0
SLICE_TYPE_B = 1
SLICE_TYPE_I = 2


@dataclass
class SPS:
    width: int
    height: int
    num_ref_frames: int = 1
    log2_max_frame_num: int = 8
    level_idc: int = 30
    sps_id: int = 0
    poc_type: int = 2         # 2 for IPPP (decode==display); 0 with B
    log2_max_poc_lsb: int = 10
    profile: int = PROFILE_BASELINE

    @property
    def mb_width(self) -> int:
        return (self.width + 15) // 16

    @property
    def mb_height(self) -> int:
        return (self.height + 15) // 16

    def write(self) -> bytes:
        bw = BitWriter()
        bw.write(8, self.profile)
        bw.write1(1 if self.profile == PROFILE_BASELINE else 0)
        bw.write1(1 if self.profile == PROFILE_MAIN else 0)
        bw.write1(0)  # constraint_set2
        bw.write(5, 0)  # constraint_set3 + reserved
        bw.write(8, self.level_idc)
        bw.write_ue(self.sps_id)
        if self.profile >= PROFILE_HIGH:
            # High-profile extension block (spec 7.3.2.1; reference
            # sps_write for FRExt profiles)
            bw.write_ue(1)   # chroma_format_idc 4:2:0
            bw.write_ue(0)   # bit_depth_luma_minus8
            bw.write_ue(0)   # bit_depth_chroma_minus8
            bw.write1(0)     # qpprime_y_zero_transform_bypass
            bw.write1(0)     # seq_scaling_matrix_present
        bw.write_ue(self.log2_max_frame_num - 4)
        bw.write_ue(self.poc_type)
        if self.poc_type == 0:
            bw.write_ue(self.log2_max_poc_lsb - 4)
        bw.write_ue(self.num_ref_frames)
        bw.write1(0)  # gaps_in_frame_num_value_allowed
        bw.write_ue(self.mb_width - 1)
        bw.write_ue(self.mb_height - 1)
        bw.write1(1)  # frame_mbs_only
        bw.write1(1)  # direct_8x8_inference
        crop_r = self.mb_width * 16 - self.width
        crop_b = self.mb_height * 16 - self.height
        if crop_r or crop_b:
            bw.write1(1)
            bw.write_ue(0)
            bw.write_ue(crop_r // 2)
            bw.write_ue(0)
            bw.write_ue(crop_b // 2)
        else:
            bw.write1(0)
        bw.write1(0)  # vui_parameters_present
        bw.rbsp_trailing()
        return bw.get_bytes()


@dataclass
class PPS:
    pps_id: int = 0
    sps_id: int = 0
    pic_init_qp: int = 26
    chroma_qp_index_offset: int = 0
    num_ref_idx_l0_active: int = 1
    cabac: bool = False
    transform_8x8: bool = False

    def write(self) -> bytes:
        bw = BitWriter()
        bw.write_ue(self.pps_id)
        bw.write_ue(self.sps_id)
        bw.write1(1 if self.cabac else 0)  # entropy_coding_mode
        bw.write1(0)  # pic_order_present
        bw.write_ue(0)  # num_slice_groups - 1
        bw.write_ue(self.num_ref_idx_l0_active - 1)
        bw.write_ue(0)  # num_ref_idx_l1_active - 1
        bw.write1(0)  # weighted_pred
        bw.write(2, 0)  # weighted_bipred_idc
        bw.write_se(self.pic_init_qp - 26)
        bw.write_se(0)  # pic_init_qs
        bw.write_se(self.chroma_qp_index_offset)
        bw.write1(1)  # deblocking_filter_control_present
        bw.write1(0)  # constrained_intra_pred
        bw.write1(0)  # redundant_pic_cnt_present
        if self.transform_8x8:
            # PPS FRExt tail (spec 7.3.2.2 more_rbsp_data section)
            bw.write1(1)     # transform_8x8_mode_flag
            bw.write1(0)     # pic_scaling_matrix_present
            bw.write_se(self.chroma_qp_index_offset)  # 2nd chroma offset
        bw.rbsp_trailing()
        return bw.get_bytes()


def write_slice_header(bw: BitWriter, sps: SPS, pps: PPS, slice_type: int,
                       frame_num: int, qp: int, idr: bool,
                       idr_pic_id: int = 0,
                       disable_deblock: int = 1,
                       poc_lsb: int = 0, is_ref: bool = True) -> None:
    """Single-slice frame header (reference: encoder/encoder.c slice
    header writer; fields per spec 7.3.3)."""
    bw.write_ue(0)  # first_mb_in_slice
    bw.write_ue(slice_type)
    bw.write_ue(pps.pps_id)
    bw.write(sps.log2_max_frame_num, frame_num % (1 << sps.log2_max_frame_num))
    if idr:
        bw.write_ue(idr_pic_id)
    if sps.poc_type == 0:
        bw.write(sps.log2_max_poc_lsb,
                 poc_lsb % (1 << sps.log2_max_poc_lsb))
    if slice_type == SLICE_TYPE_B:
        bw.write1(1)  # direct_spatial_mv_pred_flag (spatial direct)
    if slice_type in (SLICE_TYPE_P, SLICE_TYPE_B):
        if (slice_type == SLICE_TYPE_B
                and pps.num_ref_idx_l0_active != 1):
            # B MBs here use one ref per list; override the PPS's
            # multi-ref P default (spec 7.4.3 num_ref_idx_active)
            bw.write1(1)
            bw.write_ue(0)   # num_ref_idx_l0_active_minus1
            bw.write_ue(0)   # num_ref_idx_l1_active_minus1
        else:
            bw.write1(0)  # num_ref_idx_active_override
        bw.write1(0)  # ref_pic_list_reordering_flag_l0
        if slice_type == SLICE_TYPE_B:
            bw.write1(0)  # ref_pic_list_reordering_flag_l1
    # dec_ref_pic_marking only for reference pictures (nal_ref_idc != 0)
    if idr:
        bw.write1(0)  # no_output_of_prior_pics
        bw.write1(0)  # long_term_reference_flag
    elif is_ref:
        bw.write1(0)  # adaptive_ref_pic_marking_mode (sliding window)
    if pps.cabac and slice_type != SLICE_TYPE_I:
        bw.write_ue(0)  # cabac_init_idc
    bw.write_se(qp - pps.pic_init_qp)
    # deblocking_filter_control_present == 1:
    bw.write_ue(disable_deblock)
    if disable_deblock != 1:
        bw.write_se(0)  # alpha offset / 2
        bw.write_se(0)  # beta offset / 2


NAL_SEI = 6
SEI_USER_DATA_UNREGISTERED = 5

# 16-byte UUID identifying this encoder's SEI (role of the x264 uuid in
# encoder/set.c:475-483)
_SEI_UUID = bytes([0x7c, 0x1d, 0xb2, 0x54, 0x6e, 0x49, 0x41, 0x3a,
                   0x8e, 0x11, 0x5d, 0x2f, 0x0a, 0xc5, 0x64, 0x9b])


def sei_version_payload(opt_string: str) -> bytes:
    """SEI user_data_unregistered RBSP carrying the encoder id +
    options string (x264_sei_version_write, encoder/set.c:475)."""
    body = _SEI_UUID + (
        "video-steganography-pcamv-tpu - H.264/MV-stego encoder"
        " - options: " + opt_string).encode() + b"\x00"
    bw = BitWriter()
    bw.write(8, SEI_USER_DATA_UNREGISTERED)   # payload type
    size = len(body)
    while size >= 255:
        bw.write(8, 255)
        size -= 255
    bw.write(8, size)
    for byte in body:
        bw.write(8, byte)
    bw.rbsp_trailing()
    return bw.get_bytes()
