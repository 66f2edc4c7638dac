package graft.curves

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import Curves._

class CurvesSpec extends AnyFunSuite {

  /** Minimal deterministic property driver over a ScalaCheck Gen (the
    * scalatest-scalacheck bridge artifact is not on the offline classpath). */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val valuesGen: Gen[List[Float]] =
    Gen.chooseNum(3, 200).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(-2900, 2900).map(v => ((v / 12) * 12).toFloat))
    }

  private def assertValidCurve(c: Curve): Unit = {
    assert(c.length >= 2)
    assert(c.head.y == 0f, "first y must be 0")
    assert(c.last.y == 1f, "last y must be 1")
    c.sliding(2).foreach { case Array(a, b) =>
      assert(a.x < b.x, s"x strictly increasing: ${a.x} < ${b.x}")
      assert(a.y <= b.y + 1e-5f, s"y monotone: ${a.y} <= ${b.y}")
    }
  }

  test("makeCurve invariants: monotone y in [0,1], endpoints 0/1") {
    forAll(valuesGen) { vs =>
      whenever(vs.distinct.size >= 3) {
        makeCurve(vs, None).foreach { case (c, sumW) =>
          assertValidCurve(c)
          assert(math.abs(sumW - vs.size) < 1e-3, "no focus -> weight 1 each")
        }
      }
    }
  }

  test("makeCurve returns None for degenerate inputs") {
    assert(makeCurve(Nil, None).isEmpty)
    assert(makeCurve(Seq(5f, 5f, 5f), None).isEmpty) // single distinct x
  }

  test("makeCurve reproduces reference zero-initial-last_x quirk") {
    // smallest value 0.0 emits no own point (curve_utils.rs:77 lastX=0.0)
    val Some((c, _)) = makeCurve(Seq(0f, 10f, 20f), None)
    assert(c.map(_.x).toSeq == Seq(10f, 20f))
  }

  test("yAtX clamps outside domain and interpolates linearly") {
    val c = Array(CPoint(0f, 0f), CPoint(10f, 0.5f), CPoint(20f, 1f))
    assert(yAtX(c, -5f) == 0f)
    assert(yAtX(c, 25f) == 1f)
    assert(math.abs(yAtX(c, 5f) - 0.25f) < 1e-6)
    assert(math.abs(yAtX(c, 15f) - 0.75f) < 1e-6)
  }

  test("xAtY is a left inverse of yAtX on strictly increasing curves") {
    forAll(valuesGen) { vs =>
      whenever(vs.distinct.size >= 3) {
        makeCurve(vs, None).foreach { case (c, _) =>
          for (p <- Seq(0.1f, 0.3f, 0.5f, 0.7f, 0.9f)) {
            val x = xAtY(c, p)
            val y = yAtX(c, x)
            // flat segments may shift x but y must round-trip
            assert(math.abs(y - p) < 1e-3f || yAtX(c, x + 1e-3f) >= p)
          }
        }
      }
    }
  }

  test("simplify stays within epsilon of the original") {
    forAll(valuesGen) { vs =>
      whenever(vs.distinct.size >= 4) {
        makeCurve(vs, None).foreach { case (c, _) =>
          val eps = 0.01f
          val s = simplify(c, eps)
          assertValidCurve(s)
          assert(s.length <= c.length)
          c.foreach { p =>
            assert(math.abs(yAtX(s, p.x) - p.y) <= eps + 1e-4f,
              s"deviation at ${p.x}")
          }
        }
      }
    }
  }

  test("average of identical curves is the same curve (pointwise)") {
    val Some((c, _)) = makeCurve(Seq(0f, 12f, 24f, 48f, 96f), None)
    val a = average(Seq(c, c, c))
    c.foreach(p => assert(math.abs(yAtX(a, p.x) - p.y) < 1e-5f))
  }

  test("average is bounded by min/max of inputs and monotone") {
    val Some((c1, _)) = makeCurve(Seq(0f, 12f, 24f, 36f), None)
    val Some((c2, _)) = makeCurve(Seq(12f, 48f, 96f, 120f), None)
    val a = average(Seq(c1, c2))
    assert(a.head.y == 0f && a.last.y == 1f)
    a.sliding(2).foreach { case Array(p, q) => assert(p.y <= q.y + 1e-6f) }
  }

  test("weight: triangular kernel around focus") {
    assert(weight(5f, Some(5f), 0f, 10f) == 1f)
    assert(weight(0f, Some(5f), 0f, 10f) == 0f)
    assert(weight(10f, Some(5f), 0f, 10f) == 0f)
    assert(math.abs(weight(2.5f, Some(5f), 0f, 10f) - 0.5f) < 1e-6)
    assert(weight(3f, None, 0f, 10f) == 1f)
    assert(weight(-1f, None, 0f, 10f) == 0f)
  }

  test("makeCurveFromCells equals makeCurve on the expanded multiset") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 20) {
      val cells = (0 until (2 + rnd.nextInt(30))).map { _ =>
        (((rnd.nextInt(80) - 20) * 12).toFloat, 1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (v, cs) => (v, cs.map(_._2).sum) }
        .toArray.sortBy(_._1)
      val expanded = cells.flatMap { case (v, c) => Seq.fill(c.toInt)(v) }.toSeq
      val focus = if (trial % 2 == 0) None else Some(expanded(rnd.nextInt(expanded.size)))
      (makeCurveFromCells(cells, focus), makeCurve(expanded, focus)) match {
        case (None, None) => ()
        case (Some((ca, wa)), Some((cb, wb))) =>
          assert(ca.length == cb.length, s"trial $trial point count")
          ca.zip(cb).foreach { case (a, b) =>
            assert(a.x == b.x && math.abs(a.y - b.y) < 1e-5f, s"trial $trial: $a vs $b")
          }
          assert(math.abs(wa - wb) < math.max(1f, wb) * 1e-4f, s"trial $trial sumW")
        case (a, b) => fail(s"trial $trial: $a vs $b")
      }
    }
  }

  test("makeCurveSetFromCells equals makeCurveSet on the expanded pairs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 10) {
      val cells = (0 until (25 + rnd.nextInt(60))).map { _ =>
        (((rnd.nextInt(40) - 10) * 12).toFloat, ((rnd.nextInt(50) - 15) * 12).toFloat,
          1L + rnd.nextInt(6))
      }.groupBy(t => (t._1, t._2)).map { case ((s, e), cs) => (s, e, cs.map(_._3).sum) }
        .toArray.sortBy(t => (t._1, t._2))
      // makeCurveSet expands via its own canonical grouping — same input set
      val pairs = cells.flatMap { case (s, e, c) => Seq.fill(c.toInt)((s, e)) }.toSeq
      (makeCurveSetFromCells(cells), makeCurveSet(pairs)) match {
        case (None, None) => ()
        case (Some((sa, na)), Some((sb, nb))) =>
          assert(na == nb, s"trial $trial sample size")
          assert(sa.length == sb.length, s"trial $trial curve count")
          sa.zip(sb).foreach { case ((fa, ca), (fb, cb)) =>
            assert(fa == fb, s"trial $trial focus")
            assert(ca.length == cb.length)
            ca.zip(cb).foreach { case (a, b) =>
              assert(a.x == b.x && math.abs(a.y - b.y) < 1e-5f)
            }
          }
        case (a, b) => fail(s"trial $trial: one side empty")
      }
    }
  }

  test("makeCurveSet: markers respect >=20s spacing; curves valid") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 500).map { _ =>
      val s = ((rnd.nextInt(400) - 100) / 12 * 12).toFloat
      (s, s + (rnd.nextInt(120) - 60).toFloat)
    }
    val Some((set, sampleSize)) = makeCurveSet(pairs)
    assert(set.nonEmpty && sampleSize > 0)
    set.foreach { case (_, c) =>
      assert(c.head.y == 0f && c.last.y == 1f)
      assert(maxX(c) >= minX(c) + 13.0f)
    }
    val foci = set.map(_._1)
    foci.sliding(2).foreach {
      case Array(a, b) => assert(b - a >= 19.99f || foci.length <= 2)
      case _ =>
    }
  }

  test("curveSetInterpolate clamps and blends") {
    val Some((c1, _)) = makeCurve(Seq(0f, 12f, 24f), None)
    val Some((c2, _)) = makeCurve(Seq(48f, 96f, 120f), None)
    val set = Seq((0f, c1), (100f, c2))
    assert(curveSetInterpolate(set, -10f).sameElements(c1))
    assert(curveSetInterpolate(set, 200f).sameElements(c2))
    val mid = curveSetInterpolate(set, 50f)
    mid.foreach { p =>
      val expect = (yAtX(c1, p.x) + yAtX(c2, p.x)) / 2f
      assert(math.abs(p.y - expect) < 1e-5f)
    }
  }

  test("convolve: mass ~1, monotone, shifted domain") {
    val Some((a, _)) = makeCurve(Seq(0f, 60f, 120f, 180f, 240f), None)
    val Some((b, _)) = makeCurve(Seq(30f, 60f, 90f, 150f), None)
    val c = convolve(a, b)
    assertValidCurve(c)
    // domain of the sum roughly min_a+min_b .. max_a+max_b
    assert(minX(c) >= minX(a) + minX(b) - 100f)
    assert(maxX(c) <= maxX(a) + maxX(b) + 100f)
  }

  test("transferProbability: certain catch vs certain miss") {
    val arr = Array(CPoint(0f, 0f), CPoint(10f, 1f))
    val depLate = Array(CPoint(600f, 0f), CPoint(610f, 1f))
    val depEarly = Array(CPoint(-610f, 0f), CPoint(-600f, 1f))
    assert(transferProbability(arr, 0.0, depLate, 0.0) > 0.99f)
    assert(transferProbability(arr, 0.0, depEarly, 0.0) < 0.01f)
  }

  test("walkTimeCurve: short distance uniform, longer monotone span") {
    val short = walkTimeCurve(10f)
    assert(short.toSeq == Seq(CPoint(-12f, 0f), CPoint(12f, 1f)))
    val c = walkTimeCurve(300f)
    assert(c.head.y == 0f && c.last.y == 1f)
    assert(minX(c) >= 300f / 3.5f + 10f - 1f)
    c.sliding(2).foreach { case Array(p, q) => assert(p.y <= q.y + 1e-6f) }
  }

  test("percentiles are monotone") {
    val Some((c, _)) = makeCurve(Seq(-60f, -12f, 0f, 12f, 36f, 60f, 120f), None)
    val ps = percentiles(c)
    ps.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
  }
}
