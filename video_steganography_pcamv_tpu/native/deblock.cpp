// H.264 in-loop deblocking filter (host-side, serial raster order).
//
// Normative spec 8.7 math; structure mirrors the reference driver
// (common/frame.c:627-811 x264_frame_deblock_row + the ffmpeg-derived
// edge filters :425-590) specialised to this build's feature set:
// progressive frames, 4x4 transform, 16x16 partitions, single reference,
// CQP (edge qp == slice qp). Shared by the encoder (recon -> next ref)
// and the verification decoder via ctypes.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <initializer_list>

#include "deblock_tables.inc"

namespace {

inline int clip3(int v, int lo, int hi) {
  return v < lo ? lo : v > hi ? hi : v;
}
inline uint8_t clip255(int v) { return (uint8_t)(v < 0 ? 0 : v > 255 ? 255 : v); }

// normal filter, one 1D sample line across the edge (spec 8.7.2.3)
inline void filt_luma_normal(uint8_t* p, int xs, int alpha, int beta,
                             int tc0) {
  const int p2 = p[-3 * xs], p1 = p[-2 * xs], p0 = p[-1 * xs];
  const int q0 = p[0], q1 = p[xs], q2 = p[2 * xs];
  if (abs(p0 - q0) >= alpha || abs(p1 - p0) >= beta || abs(q1 - q0) >= beta)
    return;
  int tc = tc0;
  if (abs(p2 - p0) < beta) {
    p[-2 * xs] = (uint8_t)(p1 + clip3(((p2 + ((p0 + q0 + 1) >> 1)) >> 1) - p1,
                                      -tc0, tc0));
    tc++;
  }
  if (abs(q2 - q0) < beta) {
    p[xs] = (uint8_t)(q1 + clip3(((q2 + ((p0 + q0 + 1) >> 1)) >> 1) - q1,
                                 -tc0, tc0));
    tc++;
  }
  const int delta = clip3((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc);
  p[-1 * xs] = clip255(p0 + delta);
  p[0] = clip255(q0 - delta);
}

inline void filt_luma_intra(uint8_t* p, int xs, int alpha, int beta) {
  const int p3 = p[-4 * xs], p2 = p[-3 * xs], p1 = p[-2 * xs],
            p0 = p[-1 * xs];
  const int q0 = p[0], q1 = p[xs], q2 = p[2 * xs], q3 = p[3 * xs];
  if (abs(p0 - q0) >= alpha || abs(p1 - p0) >= beta || abs(q1 - q0) >= beta)
    return;
  if (abs(p0 - q0) < ((alpha >> 2) + 2)) {
    if (abs(p2 - p0) < beta) {
      p[-1 * xs] = (uint8_t)((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
      p[-2 * xs] = (uint8_t)((p2 + p1 + p0 + q0 + 2) >> 2);
      p[-3 * xs] = (uint8_t)((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3);
    } else {
      p[-1 * xs] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
    }
    if (abs(q2 - q0) < beta) {
      p[0] = (uint8_t)((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3);
      p[xs] = (uint8_t)((p0 + q0 + q1 + q2 + 2) >> 2);
      p[2 * xs] = (uint8_t)((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3);
    } else {
      p[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
    }
  } else {
    p[-1 * xs] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
    p[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
  }
}

inline void filt_chroma_normal(uint8_t* p, int xs, int alpha, int beta,
                               int tc) {
  const int p1 = p[-2 * xs], p0 = p[-1 * xs];
  const int q0 = p[0], q1 = p[xs];
  if (abs(p0 - q0) >= alpha || abs(p1 - p0) >= beta || abs(q1 - q0) >= beta)
    return;
  const int delta = clip3((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc);
  p[-1 * xs] = clip255(p0 + delta);
  p[0] = clip255(q0 - delta);
}

inline void filt_chroma_intra(uint8_t* p, int xs, int alpha, int beta) {
  const int p1 = p[-2 * xs], p0 = p[-1 * xs];
  const int q0 = p[0], q1 = p[xs];
  if (abs(p0 - q0) >= alpha || abs(p1 - p0) >= beta || abs(q1 - q0) >= beta)
    return;
  p[-1 * xs] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
  p[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
}

struct Ctx {
  uint8_t *y, *u, *v;
  int mbw, mbh, wy, wc;
  const uint8_t* intra;  // [N]
  const int32_t* nnz;    // [4mbh][4mbw]
  const int32_t* mv;     // [4mbh][4mbw][2] (4x4 granularity)
  const int32_t* ref;    // [4mbh][4mbw] L0 refs (nullable = all 0)
  const uint8_t* skip;   // [N]
  int qp, qpc;
  const uint8_t* trans8 = nullptr;  // [N] transform_size_8x8 per MB
  int off_a = 0, off_b = 0;  // FilterOffsetA/B (2 * slice div2 values)
  int cqo = 0;               // chroma_qp_index_offset (qp_thresh term)
  // per-MB QP maps (adaptive quantization): when set, MB edges use
  // QPav = (QPp + QPq + 1) >> 1 (spec 8.7.2.2 / reference
  // common/frame.c deblock_edge qp averaging); null = slice qp
  const int32_t* qp_map = nullptr;   // [N] luma QPY
  const int32_t* qpc_map = nullptr;  // [N] chroma QPC
  // B slices: second-list motion (reference frame.c:735-741 compares
  // BOTH lists; unused-list cells carry ref -1 / mv 0, the x264 cache
  // convention). Null = P slice (L0 only).
  const int32_t* mv_l1 = nullptr;    // [4mbh][4mbw][2]
  const int32_t* ref_l1 = nullptr;   // [4mbh][4mbw]
};

// B-slice bS MV-compare rule selector (experimental, env-driven while
// the FFmpeg-vs-reference B-deblock corner is being pinned down):
//   0 = straight per-list compare (reference frame.c:734-741)
//   1 = AND-of-pairings: bS=0 only when BOTH the straight (l0-l0 +
//       l1-l1) and crossed (l0-l1 + l1-l0) pairings fully match
//   2 = OR-of-pairings: bS=0 when EITHER pairing fully matches
//       (spec 8.7.2.1 "refs compared without regard to list")
static int b_bs_rule() {
  static int rule = -1;
  if (rule < 0) {
    const char* e = getenv("PCAMV_B_BS_RULE");
    rule = e ? atoi(e) : 0;
  }
  return rule;
}

// bS for one 4-sample group on an edge between 4x4 blocks p(-1 side) / q
inline int bs_inter(const Ctx& c, int qx, int qy, int px, int py) {
  // global 4x4 coords; both MBs inter here
  if (c.nnz[qy * 4 * c.mbw + qx] || c.nnz[py * 4 * c.mbw + px]) return 2;
  const int iq = qy * 4 * c.mbw + qx, ip = py * 4 * c.mbw + px;
  const int32_t* mq = &c.mv[iq * 2];
  const int32_t* mp = &c.mv[ip * 2];
  if (c.mv_l1 && b_bs_rule() != 0) {
    const int32_t* nq = &c.mv_l1[iq * 2];
    const int32_t* np = &c.mv_l1[ip * 2];
    const int r0q = c.ref ? c.ref[iq] : 0, r0p = c.ref ? c.ref[ip] : 0;
    const int r1q = c.ref_l1 ? c.ref_l1[iq] : 0;
    const int r1p = c.ref_l1 ? c.ref_l1[ip] : 0;
    const bool straight =
        r0q == r0p && abs(mq[0] - mp[0]) < 4 && abs(mq[1] - mp[1]) < 4 &&
        r1q == r1p && abs(nq[0] - np[0]) < 4 && abs(nq[1] - np[1]) < 4;
    const bool cross =
        r0q == r1p && abs(mq[0] - np[0]) < 4 && abs(mq[1] - np[1]) < 4 &&
        r1q == r0p && abs(nq[0] - mp[0]) < 4 && abs(nq[1] - mp[1]) < 4;
    if (b_bs_rule() == 1) return (straight && cross) ? 0 : 1;
    return (straight || cross) ? 0 : 1;
  }
  // different reference pictures or |mvdiff| >= 4 in EITHER list ->
  // bS = 1 (spec 8.7.2.1 via the reference's per-list compare,
  // frame.c:734-741; ordered pairing, like x264)
  if (c.ref && c.ref[iq] != c.ref[ip]) return 1;
  if (abs(mq[0] - mp[0]) >= 4 || abs(mq[1] - mp[1]) >= 4) return 1;
  if (c.mv_l1) {
    if (c.ref_l1 && c.ref_l1[iq] != c.ref_l1[ip]) return 1;
    const int32_t* nq = &c.mv_l1[iq * 2];
    const int32_t* np = &c.mv_l1[ip * 2];
    if (abs(nq[0] - np[0]) >= 4 || abs(nq[1] - np[1]) >= 4) return 1;
  }
  return 0;
}

// Debug/experiment hook: when set, overrides derived inter bS per
// (mb, dir, edge, group): int8 [mbh*mbw][2][4][4]; -1 = derive.
static const int8_t* g_bs_override = nullptr;
extern "C" void pcamv_set_bs_override(const int8_t* p) {
  g_bs_override = p;
}

void deblock_mb(const Ctx& c, int mbx, int mby) {
  // 8x8-transform MBs: internal 4x4-only luma edges (e = 1, 3) are not
  // transform edges and are NOT filtered (spec 8.7 transform_size_8x8)
  // indexA/indexB (spec 8.7.2.2): qp + FilterOffsetA/B, clipped by the
  // table's +-12 margin (offsets are within +-12 by syntax range)
  const int mb = mby * c.mbw + mbx;
  const int cur_qp = c.qp_map ? c.qp_map[mb] : c.qp;
  const int cur_qpc = c.qpc_map ? c.qpc_map[mb] : c.qpc;
  const bool cur_intra = c.intra[mb];
  // qp_thresh (reference frame.c:633): below it no internal edge can
  // filter, but MB-boundary edges still can — their qPav with a
  // higher-QP neighbour (AQ qp_map) may clear the alpha/beta cut, so
  // there is no whole-MB early return; each edge re-checks its own
  // alpha/beta below.
  const int qp_thresh = 15 - (c.off_a < c.off_b ? c.off_a : c.off_b)
                        - (c.cqo > 0 ? c.cqo : 0);
  int edge_end = (c.skip && c.skip[mb]) ? 1 : 4;
  if (cur_qp <= qp_thresh) edge_end = 1;

  uint8_t* py = c.y + 16 * mby * c.wy + 16 * mbx;
  uint8_t* pu = c.u + 8 * mby * c.wc + 8 * mbx;
  uint8_t* pv = c.v + 8 * mby * c.wc + 8 * mbx;

  for (int dir = 0; dir < 2; dir++) {
    const int first = dir == 0 ? (mbx == 0 ? 1 : 0) : (mby == 0 ? 1 : 0);
    for (int e = first; e < edge_end; e++) {
      const bool mb_edge = (e == 0);
      // edge qp: MB-boundary edges average the two MBs' QP
      // (spec 8.7.2.2 qPav; internal edges use the MB's own)
      int eqp = cur_qp, eqpc = cur_qpc;
      if (mb_edge && c.qp_map) {
        const int nb = dir == 0 ? mb - 1 : mb - c.mbw;
        eqp = (c.qp_map[nb] + cur_qp + 1) >> 1;
        eqpc = (c.qpc_map[nb] + cur_qpc + 1) >> 1;
      }
      const int a_l = ALPHA_TAB[eqp + c.off_a + 12];
      const int b_l = BETA_TAB[eqp + c.off_b + 12];
      const int a_c = ALPHA_TAB[eqpc + c.off_a + 12];
      const int b_c = BETA_TAB[eqpc + c.off_b + 12];
      if (!a_l || !b_l) continue;
      const bool nb_intra =
          mb_edge && c.intra[dir == 0 ? mb - 1 : mb - c.mbw];
      const bool intra_strong = mb_edge && (cur_intra || nb_intra);
      int bs[4];
      if (!intra_strong) {
        for (int i = 0; i < 4; i++) {
          if (cur_intra || (mb_edge && nb_intra)) {
            bs[i] = 3;
            continue;
          }
          int x = dir == 0 ? e : i;
          int y = dir == 0 ? i : e;
          int gqx = 4 * mbx + x, gqy = 4 * mby + y;
          int gpx = dir == 0 ? gqx - 1 : gqx;
          int gpy = dir == 0 ? gqy : gqy - 1;
          bs[i] = bs_inter(c, gqx, gqy, gpx, gpy);
          if (g_bs_override) {
            int8_t o = g_bs_override[((mb * 2 + dir) * 4 + e) * 4 + i];
            if (o >= 0) bs[i] = o;
          }
        }
      }
      // luma
      if (c.trans8 && c.trans8[mb] && (e & 1)) goto chroma;
      for (int i = 0; i < 4; i++) {
        for (int d = 0; d < 4; d++) {
          uint8_t* p = dir == 0
              ? py + (4 * i + d) * c.wy + 4 * e
              : py + 4 * e * c.wy + 4 * i + d;
          int xs = dir == 0 ? 1 : c.wy;
          if (intra_strong) {
            filt_luma_intra(p, xs, a_l, b_l);
          } else if (bs[i] > 0) {
            filt_luma_normal(p, xs, a_l, b_l,
                             TC0_TAB[eqp + c.off_a + 12][bs[i]]);
          }
        }
      }
      // chroma on even edges
      chroma:
      if (!(e & 1) && a_c && b_c) {
        for (int i = 0; i < 4; i++) {
          for (int d = 0; d < 2; d++) {
            int off = 2 * i + d;
            for (uint8_t* base : {pu, pv}) {
              uint8_t* p = dir == 0
                  ? base + off * c.wc + 2 * e
                  : base + 2 * e * c.wc + off;
              int xs = dir == 0 ? 1 : c.wc;
              if (intra_strong) {
                filt_chroma_intra(p, xs, a_c, b_c);
              } else if (bs[i] > 0) {
                filt_chroma_normal(p, xs, a_c, b_c,
                                   TC0_TAB[eqpc + c.off_a + 12][bs[i]]
                                   + 1);
              }
            }
          }
        }
      }
    }
  }
}

}  // namespace

extern "C" void pcamv_deblock_frame(uint8_t* y, uint8_t* u, uint8_t* v,
                                    int mbw, int mbh,
                                    const uint8_t* intra,
                                    const int32_t* nnz, const int32_t* mv,
                                    const int32_t* ref,
                                    const uint8_t* skip, int qp, int qpc,
                                    const uint8_t* trans8,
                                    int off_a, int off_b,
                                    const int32_t* qp_map,
                                    const int32_t* qpc_map,
                                    int chroma_qp_offset,
                                    const int32_t* mv_l1,
                                    const int32_t* ref_l1) {
  Ctx c{y, u, v, mbw, mbh, 16 * mbw, 8 * mbw, intra, nnz, mv, ref, skip,
        qp, qpc, trans8, off_a, off_b, chroma_qp_offset, qp_map, qpc_map,
        mv_l1, ref_l1};
  for (int mby = 0; mby < mbh; mby++)
    for (int mbx = 0; mbx < mbw; mbx++)
      deblock_mb(c, mbx, mby);
}
