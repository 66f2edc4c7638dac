package graft.gtfs

import graft.curves.{CPoint, Curves}

/** X15 — PNG heat-strip rendering of a prediction curve (reference
  * `src/monitor/mod.rs:1215-1262`): sample the cumulative curve at
  * `width + 1` pixel boundaries across the page window, de-cumulate to
  * per-pixel density, normalize by the strip maximum (clamped to ≥ 0.05),
  * and map density through a cropped gradient (bottom/top 20 % of the ramp
  * unused) — YlOrBr for arrivals, YlGnBu for departures. Pixels inside the
  * CDF tails (cumulative ≤ 0.01 or ≥ 0.99 but strictly inside (0, 1)) take
  * the gradient floor; pixels fully outside the distribution render white.
  *
  * The strip encodes through the real zlib PNG writer
  * ([[graft.ops.MediaCodec.pngBytes]], 8-bit truecolor with genuine CRCs)
  * as RGBA with the reference's constant alpha 255 (color type 6;
  * `src/monitor/mod.rs:1226`, `:1257` push alpha 255 per pixel).
  * Gradient evaluation follows the reference's `colorous` crate — a port of
  * d3-scale-chromatic, whose multi-anchor ramps evaluate a UNIFORM CUBIC
  * BASIS SPLINE over the public 9-class ColorBrewer anchors (d3's
  * `interpolateRgbBasis`: per-channel B-spline with reflected phantom
  * endpoints `2·v₀−v₁` / `2·v₈−v₇`, so t=0/t=1 hit the first/last anchor
  * exactly while interior anchors are approximated, as a B-spline does);
  * the density pipeline (f32 sampling, de-cumulation, max-clamp, crop,
  * tail/white cases) follows the reference operation by operation so the
  * DuckDB oracle can replay every pixel exactly.
  */
object HeatStrip {

  /** ColorBrewer 9-class sequential anchors (public specification). */
  val YlOrBr: Array[(Int, Int, Int)] = Array(
    (255, 255, 229), (255, 247, 188), (254, 227, 145), (254, 196, 79),
    (254, 153, 41), (236, 112, 20), (204, 76, 2), (153, 52, 4), (102, 37, 6))
  val YlGnBu: Array[(Int, Int, Int)] = Array(
    (255, 255, 217), (237, 248, 177), (199, 233, 180), (127, 205, 187),
    (65, 182, 196), (29, 145, 192), (34, 94, 168), (37, 52, 148), (8, 29, 88))

  /** Uniform cubic basis-spline gradient sample at `t` ∈ [0, 1] over the 9
    * anchors (8 segments), matching d3's `interpolateRgbBasis` / colorous:
    * segment `i = min(⌊8t⌋, 7)`, local `t₁ = 8t − i`, control points
    * `v₀..v₃ = anchors(i−1..i+2)` with reflected phantoms past the ends, and
    *
    * {{{ ((1−3t₁+3t₁²−t₁³)v₀ + (4−6t₁²+3t₁³)v₁ + (1+3t₁+3t₁²−3t₁³)v₂ + t₁³v₃) / 6 }}}
    *
    * per channel, rounded then clamped to [0, 255] (the phantom reflection
    * can push a convex combination slightly past an end anchor).
    * `math.round` half-up matches DuckDB ROUND for the non-negative values
    * that survive the clamp; the oracle SQL in MonitorPack mirrors this
    * expression term-for-term so both engines compute identical doubles. */
  def color(anchors: Array[(Int, Int, Int)], t: Double): (Int, Int, Int) = {
    val tc = math.max(0.0, math.min(1.0, t))
    val pos = tc * 8.0
    val i = math.min(pos.toInt, 7)
    val t1 = pos - i
    val t2 = t1 * t1
    val t3 = t2 * t1
    val w0 = 1.0 - 3.0 * t1 + 3.0 * t2 - t3
    val w1 = 4.0 - 6.0 * t2 + 3.0 * t3
    val w2 = 1.0 + 3.0 * t1 + 3.0 * t2 - 3.0 * t3
    def ch(f: ((Int, Int, Int)) => Int): Int = {
      val v1 = f(anchors(i)); val v2 = f(anchors(i + 1))
      val v0 = if (i > 0) f(anchors(i - 1)) else 2 * v1 - v2
      val v3 = if (i < 7) f(anchors(i + 2)) else 2 * v2 - v1
      val s = (w0 * v0 + w1 * v1 + w2 * v2 + t3 * v3) / 6.0
      math.max(0, math.min(255, math.round(s).toInt))
    }
    (ch(_._1), ch(_._2), ch(_._3))
  }

  /** RGB pixel bytes (width × 1, 3 bytes per pixel) of the heat strip for a
    * cumulative curve anchored at `anchorEpoch` (absolute second of curve
    * x = 0), rendered across the absolute window [minEpoch, maxEpoch].
    * `eventType` follows [[Codes.EventArrival]]/[[Codes.EventDeparture]].
    * Float arithmetic mirrors the reference exactly: cumulative samples and
    * the de-cumulated densities are f32; the crop expression computes in
    * f32 and widens for the gradient, as the reference's `as f64` does. */
  def pixels(curve: Array[CPoint], anchorEpoch: Double, minEpoch: Double,
             maxEpoch: Double, width: Int, eventType: Int): Array[Byte] = {
    val anchors = if (eventType == Codes.EventArrival) YlOrBr else YlGnBu
    val f = (maxEpoch - minEpoch) / width
    val cum = Array.tabulate(width + 1)(i =>
      Curves.yAtX(curve, (minEpoch + f * i - anchorEpoch).toFloat))
    val uncum = Array.tabulate(width)(i => cum(i + 1) - cum(i))
    var mx = 0f
    var i = 0
    while (i < width) { if (uncum(i) > mx) mx = uncum(i); i += 1 }
    if (mx < 0.05f) mx = 0.05f
    val out = new Array[Byte](width * 3)
    i = 0
    while (i < width) {
      val pu = uncum(i) / mx
      val pc = cum(i)
      val (r, g, b) =
        if (pc > 0.01f && pc < 0.99f) color(anchors, (0.2f + pu * 0.6f).toDouble)
        else if (pc > 0f && pc < 1f) color(anchors, 0.0)
        else (255, 255, 255)
      out(i * 3) = r.toByte
      out(i * 3 + 1) = g.toByte
      out(i * 3 + 2) = b.toByte
      i += 1
    }
    out
  }

  /** RGBA pixel bytes: [[pixels]] with the reference's constant alpha 255
    * appended per pixel (mod.rs:1226, :1257). */
  def pixelsRgba(curve: Array[CPoint], anchorEpoch: Double, minEpoch: Double,
                 maxEpoch: Double, width: Int, eventType: Int): Array[Byte] = {
    val rgb = pixels(curve, anchorEpoch, minEpoch, maxEpoch, width, eventType)
    val out = new Array[Byte](width * 4)
    var i = 0
    while (i < width) {
      out(i * 4) = rgb(i * 3)
      out(i * 4 + 1) = rgb(i * 3 + 1)
      out(i * 4 + 2) = rgb(i * 3 + 2)
      out(i * 4 + 3) = 255.toByte
      i += 1
    }
    out
  }

  /** The strip as a real PNG (width × 1, 8-bit truecolor + alpha — color
    * type 6, matching the reference's RGBA byte format). */
  def png(curve: Array[CPoint], anchorEpoch: Double, minEpoch: Double,
          maxEpoch: Double, width: Int, eventType: Int): Array[Byte] =
    graft.ops.MediaCodec.pngBytes(width, 1,
      pixelsRgba(curve, anchorEpoch, minEpoch, maxEpoch, width, eventType),
      channels = 4)
}
