package graft.gtfs

import org.scalatest.funsuite.AnyFunSuite
import graft.curves.CPoint

/** X15 pixel semantics (reference src/monitor/mod.rs:1215-1262) on
  * hand-computed cases, plus the PNG encode→decode round trip. */
class HeatStripSpec extends AnyFunSuite {

  // uniform CDF over [0, 40] seconds, anchored at epoch 1000
  private val uniform = Array(CPoint(0f, 0f), CPoint(40f, 1f))

  test("white outside the distribution, gradient floor in the tails, ramp inside") {
    // window [1000, 1080], width 8 -> f = 10 s/px; the curve occupies the
    // first half of the strip
    val px = HeatStrip.pixels(uniform, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    assert(px.length == 24)
    def rgb(i: Int) = (px(i * 3) & 0xff, px(i * 3 + 1) & 0xff, px(i * 3 + 2) & 0xff)
    // px 0: cum(1000)=0 -> white per the prob_cum==0 branch
    assert(rgb(0) == (255, 255, 255))
    // px 1..3: cum in (0.01, 0.99), uncum = 0.25 each = the strip max ->
    // pu = 1 -> t = 0.8f -> basis-spline segment 6, t1 ≈ 0.4, control
    // points YlOrBr anchors 5..8: r = (0.216·236 + 3.232·204 + 2.488·153
    // + 0.064·102)/6 = 182.916 -> 183; g = 66.93 -> 67; b = 3.52 -> 4
    assert(rgb(1) == (183, 67, 4) && rgb(2) == (183, 67, 4) && rgb(3) == (183, 67, 4))
    // px 4 starts at cum=1.0 exactly -> white (outside (0,1))
    assert(rgb(4) == (255, 255, 255) && rgb(7) == (255, 255, 255))
  }

  test("tail pixels take the gradient floor, not white") {
    // steep CDF: all mass in [19, 21]; px 1 covers [10, 20): cum(10)=0 ->
    // white; a boundary INSIDE (0, 0.01] must take anchor 0
    val steep = Array(CPoint(19f, 0f), CPoint(21f, 1f))
    val px = HeatStrip.pixels(steep, 1000.0, 1000.0, 1040.0, 4, Codes.EventDeparture)
    def rgb(i: Int) = (px(i * 3) & 0xff, px(i * 3 + 1) & 0xff, px(i * 3 + 2) & 0xff)
    // px 0: cum(1000)=0 -> white; px 1: cum(1010)=0 -> white;
    // px 2 boundary 1020: cum=0.5 -> gradient; px 3: cum(1030)=1 -> white
    assert(rgb(0) == (255, 255, 255) && rgb(3) == (255, 255, 255))
    assert(rgb(2) != (255, 255, 255))
    // departure gradient = YlGnBu: pu=1 -> t=0.8f -> spline segment 6 over
    // anchors 5..8: r = 34.79 -> 35, g = 77.73 -> 78, b = 159.72 -> 160
    assert(rgb(2) == (35, 78, 160))
  }

  test("gradient floor case: cumulative in (0, 0.01]") {
    // shallow head: cum rises 0 -> 0.008 over the first pixel, then jumps;
    // boundary at cum=0.008 is in (0, 0.01] -> gradient.eval(0) = anchor 0
    val c = Array(CPoint(0f, 0.004f), CPoint(80f, 1f))
    val px = HeatStrip.pixels(c, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    def rgb(i: Int) = (px(i * 3) & 0xff, px(i * 3 + 1) & 0xff, px(i * 3 + 2) & 0xff)
    // px 0 boundary: cum = 0.004 in (0, 0.01] -> gradient.eval(0); the
    // reflected phantom endpoint makes the spline hit anchor 0 EXACTLY:
    // (v₋₁ + 4v₀ + v₁)/6 = ((2v₀−v₁) + 4v₀ + v₁)/6 = v₀
    assert(rgb(0) == (255, 255, 229))
  }

  test("gradient is the d3/colorous basis spline, not linear interpolation") {
    // at an interior knot (t = 1/8, anchor 1's position) a uniform cubic
    // B-spline APPROXIMATES the control point: value = (v₀ + 4v₁ + v₂)/6.
    // YlOrBr g channel: (255 + 4·247 + 227)/6 = 245, not the anchor's 247 —
    // linear interpolation would return the anchor exactly
    assert(HeatStrip.color(HeatStrip.YlOrBr, 0.125) == (255, 245, 188))
    // endpoints are exact thanks to the reflected phantoms
    assert(HeatStrip.color(HeatStrip.YlOrBr, 0.0) == (255, 255, 229))
    assert(HeatStrip.color(HeatStrip.YlOrBr, 1.0) == (102, 37, 6))
    assert(HeatStrip.color(HeatStrip.YlGnBu, 1.0) == (8, 29, 88))
  }

  test("png decodes identically through the JDK's independent ImageIO decoder") {
    // pngPixels round-trip uses OUR decoder; ImageIO is a fully independent
    // implementation — it validates the signature, chunk CRCs, zlib stream
    // and filter bytes, so an encoder bug our own decoder compensated for
    // cannot hide here
    val pixels = HeatStrip.pixels(uniform, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    val png = HeatStrip.png(uniform, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO must accept the stream (signature/CRC validity)")
    assert(img.getWidth == 8 && img.getHeight == 1)
    assert(img.getColorModel.hasAlpha, "color type 6 must decode with alpha")
    for (x <- 0 until 8) {
      val argb = img.getRGB(x, 0)
      val got = ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      val want = (pixels(x * 3) & 0xff, pixels(x * 3 + 1) & 0xff, pixels(x * 3 + 2) & 0xff)
      assert(got == want, s"pixel $x: ImageIO $got vs encoder input $want")
      assert(((argb >>> 24) & 0xff) == 255,
        s"pixel $x: the reference's constant alpha 255 (mod.rs:1226)")
    }
  }

  test("png round-trips the exact RGBA pixel bytes") {
    val rgb = HeatStrip.pixels(uniform, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    val rgba = HeatStrip.pixelsRgba(uniform, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    // RGBA = RGB + constant 255 per pixel
    for (x <- 0 until 8; c <- 0 until 3)
      assert(rgba(x * 4 + c) == rgb(x * 3 + c))
    assert((0 until 8).forall(x => (rgba(x * 4 + 3) & 0xff) == 255))
    val png = HeatStrip.png(uniform, 1000.0, 1000.0, 1080.0, 8, Codes.EventArrival)
    val meta = graft.ops.MediaCodec.parsePng(png)
    assert(meta.contains((8, 1, 8)))
    val decoded = graft.ops.MediaCodec.pngPixels(png)
    assert(decoded.isDefined && decoded.get.sameElements(rgba))
  }
}
