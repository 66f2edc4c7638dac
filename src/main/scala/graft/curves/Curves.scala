package graft.curves

import scala.collection.mutable.ArrayBuffer

/** One point of a piecewise-linear monotone CDF ("curve"). Spark-encodes as
  * `array<struct<x: float, y: float>>`.
  *
  * Semantics reimplemented from the call sites of the reference's external
  * `dystonse-curves` crate (see SURVEY.md §1.5): construction
  * `/root/reference/src/analyser/curve_utils.rs:65-94`, consumption
  * `/root/reference/src/types/prediction_result.rs:40-47`,
  * `/root/reference/src/monitor/time_curve.rs:34-97`.
  */
final case class CPoint(x: Float, y: Float)

/** Pure curve math (no Spark dependency). All arithmetic is Float (f32) to
  * mirror the reference's numerics (SURVEY.md §1.2, §7.4 item 3).
  *
  * A curve is an x-sorted `Array[CPoint]` with y non-decreasing, y0 = 0,
  * yN = 1 (curve_utils.rs:90-92). Evaluation clamps outside [minX, maxX].
  */
object Curves {
  type Curve = Array[CPoint]

  def minX(c: Curve): Float = c.head.x
  def maxX(c: Curve): Float = c.last.x

  /** CDF evaluation: linear interpolation, clamped to 0 / 1 outside. */
  def yAtX(c: Curve, x: Float): Float = {
    if (c.isEmpty) return 0f
    if (x <= c.head.x) return c.head.y
    if (x >= c.last.x) return c.last.y
    var i = 1
    while (i < c.length && c(i).x < x) i += 1
    val p0 = c(i - 1); val p1 = c(i)
    if (p1.x == p0.x) p1.y
    else p0.y + (p1.y - p0.y) * ((x - p0.x) / (p1.x - p0.x))
  }

  /** Quantile / inverse CDF: leftmost x reaching y, linear interpolation,
    * clamped to [minX, maxX] for y outside [y0, yN]. */
  def xAtY(c: Curve, y: Float): Float = {
    if (c.isEmpty) return 0f
    if (y <= c.head.y) return c.head.x
    if (y >= c.last.y) return c.last.x
    var i = 1
    while (i < c.length && c(i).y < y) i += 1
    val p0 = c(i - 1); val p1 = c(i)
    if (p1.y == p0.y) p0.x
    else p0.x + (p1.x - p0.x) * ((y - p0.y) / (p1.y - p0.y))
  }

  /** Point reduction within vertical tolerance `eps` (keeps endpoints):
    * drops interior points whose linear interpolation error stays < eps.
    * Contexts in the reference use eps = 0.01 / 0.001 / 0.05
    * (specific_curves.rs:363,:406; default_curves.rs:148; time_curve.rs:73).
    */
  def simplify(c: Curve, eps: Float): Curve = {
    if (c.length <= 2) return c
    val keep = new Array[Boolean](c.length)
    keep(0) = true; keep(c.length - 1) = true
    // Douglas-Peucker with vertical-only distance.
    def rec(lo: Int, hi: Int): Unit = {
      if (hi - lo < 2) return
      val p0 = c(lo); val p1 = c(hi)
      var worst = -1f; var worstI = -1
      var i = lo + 1
      while (i < hi) {
        val t = if (p1.x == p0.x) 0f else (c(i).x - p0.x) / (p1.x - p0.x)
        val interp = p0.y + (p1.y - p0.y) * t
        val d = math.abs(c(i).y - interp)
        if (d > worst) { worst = d; worstI = i }
        i += 1
      }
      if (worst >= eps) {
        keep(worstI) = true
        rec(lo, worstI); rec(worstI, hi)
      }
    }
    rec(0, c.length - 1)
    val out = new ArrayBuffer[CPoint](c.length)
    var i = 0
    while (i < c.length) { if (keep(i)) out += c(i); i += 1 }
    out.toArray
  }

  /** Pointwise mean of several CDFs on the union x-grid
    * (curve_data.rs:21-42 → crate `average`). Endpoints stay 0/1 because
    * every input evaluates to 0 at the global min x and 1 at the global max. */
  def average(cs: Seq[Curve]): Curve = {
    require(cs.nonEmpty, "average of 0 curves")
    val grid = cs.flatMap(_.map(_.x)).distinct.sorted
    val n = cs.length.toFloat
    grid.map { x =>
      var s = 0f
      cs.foreach(c => s += yAtX(c, x))
      CPoint(x, s / n)
    }.toArray
  }

  /** Triangular kernel weight (curve_utils.rs:44-63): 1 everywhere without a
    * focus; with a focus, 1 at the focus falling linearly to 0 at the bounds. */
  def weight(delay: Float, focus: Option[Float], minD: Float, maxD: Float): Float = {
    if (delay < minD || delay > maxD) 0f
    else focus match {
      case None => 1f
      case Some(f) =>
        if (delay == f) 1f
        else if (delay < f) (delay - minD) / (f - minD)
        else 1f - ((delay - f) / (maxD - f))
    }
  }

  /** Weighted ECDF build (curve_utils.rs:65-94). Returns (curve, sumOfWeights)
    * or None when fewer than 2 distinct points survive.
    *
    * Faithfully reproduces the reference's construction, including the quirk
    * that `last_x` starts at 0.0, so a smallest value of exactly 0.0 emits no
    * point of its own (its weight is carried into the next distinct x). */
  def makeCurve(values: Seq[Float], focus: Option[Float]): Option[(Curve, Float)] = {
    if (values.isEmpty) return None
    val sorted = values.toArray.sorted
    val minD = sorted.head
    val maxD = sorted.last
    val weights = sorted.map(v => weight(v, focus, minD, maxD))
    var sumW = 0f
    weights.foreach(w => sumW += w)
    if (sumW == 0f) return None
    val tups = new ArrayBuffer[CPoint](sorted.length)
    var lastX = 0f
    var i = 0f
    var k = 0
    while (k < sorted.length) {
      i += weights(k)
      if (sorted(k) != lastX) {
        tups += CPoint(sorted(k), i / sumW)
        lastX = sorted(k)
      }
      k += 1
    }
    if (tups.length < 2) return None
    tups(0) = CPoint(tups(0).x, 0f)
    tups(tups.length - 1) = CPoint(tups(tups.length - 1).x, 1f)
    Some((tups.toArray, sumW))
  }

  /** Adaptive marker subdivision (curve_utils.rs:10-42): inserts markers over
    * the initial-delay CDF such that adjacent markers are ≥20 s AND ≥20
    * samples apart; midpoint of the feasible interval; recursion stops when
    * the bounds contradict. */
  def recurseMarkers(curve: Curve, markers: ArrayBuffer[Float],
                     lower: Float, upper: Float, count: Float): Unit = {
    val minXByDelay = lower + 20.0f
    val maxXByDelay = upper - 20.0f
    val lowerY = yAtX(curve, lower)
    val upperY = yAtX(curve, upper)
    val minYByCount = lowerY + (20.0f / count)
    val maxYByCount = upperY - (20.0f / count)
    val minXByCount = xAtY(curve, minYByCount)
    val maxXByCount = xAtY(curve, maxYByCount)
    val mnX = math.max(minXByDelay, minXByCount)
    val mxX = math.min(maxXByDelay, maxXByCount)
    if (mnX <= mxX) {
      val mid = (mnX + mxX) / 2.0f
      recurseMarkers(curve, markers, lower, mid, count)
      markers += mid
      recurseMarkers(curve, markers, mid, upper, count)
    }
  }

  /** Weighted-cell form of [[makeCurve]]: `cells` is (value → multiplicity),
    * sorted ascending by value — the expansion of each value `count` times,
    * but aggregators keep compressed (value → count) buffers instead of raw
    * multisets. Reproduces [[makeCurve]]'s construction, including the
    * lastX=0 quirk and the first-occurrence cumulative rule (the point at a
    * distinct x carries only the first copy's weight; duplicate copies roll
    * into the next distinct x). Deliberate f32 deviation: the cell form
    * accumulates `w*c` in ONE multiply where the reference's per-copy fold
    * adds `w` c times — for FRACTIONAL focus weights the two can differ in
    * the last ulp (integer weights are exact below 2^24). The oracles
    * replay the cell form, so both engines agree; the per-copy fold would
    * make the aggregation O(samples) instead of O(distinct values), which
    * is the whole point of the cell buffers at corpus scale.
    * (The ECDF construction rules live in three places by design —
    * [[makeCurve]], here, and EcdfAggregator.finish with exact Long counts;
    * CurvesSpec and EcdfAggregatorSpec pin them against each other.) */
  def makeCurveFromCells(cells: Array[(Float, Long)],
                         focus: Option[Float]): Option[(Curve, Float)] = {
    if (cells.isEmpty) return None
    val minD = cells.head._1
    val maxD = cells.last._1
    var sumW = 0f
    cells.foreach { case (v, c) => sumW += weight(v, focus, minD, maxD) * c }
    if (sumW == 0f) return None
    val tups = new ArrayBuffer[CPoint](cells.length)
    var lastX = 0f
    var i = 0f
    cells.foreach { case (v, c) =>
      val w = weight(v, focus, minD, maxD)
      if (v != lastX) {
        tups += CPoint(v, (i + w) / sumW)
        lastX = v
      }
      i += w * c
    }
    if (tups.length < 2) return None
    tups(0) = CPoint(tups(0).x, 0f)
    tups(tups.length - 1) = CPoint(tups(tups.length - 1).x, 1f)
    Some((tups.toArray, sumW))
  }

  /** Curve-set build for one stop pair (specific_curves.rs:371-426):
    * sort pairs by initial delay, derive markers, build one focused weighted
    * ECDF per marker window (ε=0.001 simplify, span ≥13 s), sample_size =
    * average slice size. Returns (Array[(focus, curve)], sampleSize).
    *
    * Delegates to [[makeCurveSetFromCells]] on the canonical
    * (d_s, d_e)-sorted multiset — marker-boundary slicing within runs of
    * equal d_s was previously input-order-dependent (i.e. nondeterministic
    * under shuffles); the canonical order makes it stable. */
  def makeCurveSet(pairs: Seq[(Float, Float)]): Option[(Array[(Float, Curve)], Int)] = {
    if (pairs.isEmpty) return None
    val cells = pairs.groupBy(identity).iterator
      .map { case ((ds, de), ps) => (ds, de, ps.size.toLong) }
      .toArray.sortBy(t => (t._1, t._2))
    makeCurveSetFromCells(cells)
  }

  /** Weighted-cell form of [[makeCurveSet]]: `cells` is the
    * ((d_s, d_e) → multiplicity) multiset, sorted by (d_s, d_e). The marker
    * windows slice the canonical expansion by index without materializing
    * it — the A6 scale fix (a hot stop pair at 100 TB stays a bounded
    * ~(500×500)-cell map, the pairs being 12 s-quantized and |d|<3000). */
  def makeCurveSetFromCells(cells: Array[(Float, Float, Long)]): Option[(Array[(Float, Curve)], Int)] = {
    if (cells.isEmpty) return None
    var count = 0L
    cells.foreach(count += _._3)
    // d_s marginal (cells are (d_s, d_e)-sorted, so equal d_s are contiguous)
    val marginal = new ArrayBuffer[(Float, Long)]()
    cells.foreach { case (ds, _, c) =>
      if (marginal.nonEmpty && marginal.last._1 == ds)
        marginal(marginal.length - 1) = (ds, marginal.last._2 + c)
      else marginal += ((ds, c))
    }
    makeCurveFromCells(marginal.toArray, None).flatMap { case (initial, _) =>
      val markers = new ArrayBuffer[Float]()
      markers += minX(initial); markers += minX(initial)
      recurseMarkers(initial, markers, minX(initial), maxX(initial), count.toFloat)
      markers += maxX(initial); markers += maxX(initial)
      // start offset of each cell in the canonical expansion
      val starts = new Array[Long](cells.length)
      var acc = 0L
      var ci = 0
      while (ci < cells.length) { starts(ci) = acc; acc += cells(ci)._3; ci += 1 }
      var sampleSize = 0L
      val curves = new ArrayBuffer[(Float, Curve)]()
      markers.sliding(3).foreach {
        case ArrayBuffer(lower, mid, upper) =>
          val minIndex = (count.toFloat * yAtX(initial, lower)).toLong
          val maxIndex = (count.toFloat * yAtX(initial, upper)).toLong
          // the window's d_e sub-multiset, still as (value → count) cells
          val sliceCells = scala.collection.mutable.TreeMap.empty[Float, Long]
          var sliceLen = 0L
          ci = 0
          while (ci < cells.length) {
            val lo = math.max(minIndex, starts(ci))
            val hi = math.min(maxIndex, starts(ci) + cells(ci)._3)
            if (hi > lo) {
              val c = hi - lo
              sliceLen += c
              val de = cells(ci)._2
              sliceCells.update(de, sliceCells.getOrElse(de, 0L) + c)
            }
            ci += 1
          }
          sampleSize += sliceLen
          if (sliceLen > 1) {
            makeCurveFromCells(sliceCells.toArray, Some(mid)).foreach { case (raw, _) =>
              val curve = simplify(raw, 0.001f)
              if (maxX(curve) >= minX(curve) + 13.0f)
                curves += ((mid, curve))
            }
          }
        case _ =>
      }
      if (curves.isEmpty) None
      else Some((curves.toArray, (sampleSize / curves.length).toInt))
    }
  }

  /** Interpolated curve for an arbitrary initial delay `x` from a curve set
    * (`curve_at_x_with_continuation`, predictor/mod.rs:324): clamped to the
    * first/last curve outside the focus range, linear y-blend on the union
    * grid between the adjacent focus curves otherwise (SURVEY.md §7.4 item 7).
    */
  def curveSetInterpolate(set: Seq[(Float, Curve)], x: Float): Curve = {
    require(set.nonEmpty, "empty curve set")
    val s = set.sortBy(_._1)
    if (x <= s.head._1) return s.head._2
    if (x >= s.last._1) return s.last._2
    val i = s.indexWhere(_._1 >= x)
    val (f0, c0) = s(i - 1); val (f1, c1) = s(i)
    if (f1 == f0) return c0
    val t = (x - f0) / (f1 - f0)
    val grid = (c0.map(_.x) ++ c1.map(_.x)).distinct.sorted
    grid.map(gx => CPoint(gx, yAtX(c0, gx) * (1f - t) + yAtX(c1, gx) * t))
  }

  /** Discrete CDF convolution (time_curve.rs:34-77, `add_duration_curve`):
    * step = max(12, span/200*2) seconds (the reference's exact integer
    * form — an even step so half = step/2 tiles exactly), de-cumulate ×
    * de-cumulate, running cumulative sum, simplify(0.05). `base` and
    * `duration` share the same relative-seconds domain. */
  def convolve(base: Curve, duration: Curve): Curve = {
    var minN = math.floor(xAtY(base, 0.01f) + xAtY(duration, 0.01f)).toInt
    var maxN = math.ceil(xAtY(base, 0.99f) + xAtY(duration, 0.99f)).toInt
    val step = math.max(12, (maxN - minN) / 200 * 2)
    val half = step / 2
    minN -= step
    maxN += step
    val minK = minX(duration).toInt - step
    val maxK = math.ceil(maxX(duration)).toInt + step
    val points = new ArrayBuffer[CPoint]()
    var sum = 0f
    var n = minN
    var break = false
    while (n < maxN && !break) {
      var k = minK
      while (k < maxK) {
        val a = yAtX(base, (n - k + half).toFloat) - yAtX(base, (n - k - half).toFloat)
        val b = yAtX(duration, (k + half).toFloat) - yAtX(duration, (k - half).toFloat)
        sum += math.max(0f, a * b)
        k += step
      }
      if (points.isEmpty) points += CPoint((n - step).toFloat, 0f)
      if (sum > 1.0f) break = true
      else { points += CPoint(n.toFloat, sum); n += step }
    }
    points += CPoint((maxN + step).toFloat, 1f)
    simplify(points.toArray, 0.05f)
  }

  /** Transfer probability (time_curve.rs:18-32): integrate over 100 arrival
    * percentiles the probability that the departure has NOT yet happened.
    * `arrRef` / `depRef` are the absolute anchors (epoch seconds) of the two
    * relative curves (TimeCurve re-basing, time_curve.rs:80-97). */
  def transferProbability(arrival: Curve, arrRef: Double,
                          departure: Curve, depRef: Double): Double = {
    // per-percentile terms stay f32 (interpolation + /100 round to REAL,
    // which the SQL oracle replays bit for bit); the ACCUMULATOR is double —
    // exactly DuckDB's SUM over REAL terms — so the oracle's
    // 1.0 - SUM(CAST(v/100 AS REAL)) reproduces this value with no
    // f32-summation-order slack at the ROUND(4) boundary
    var totalMiss = 0.0
    var p = 0
    while (p < 100) {
      // the reference truncates TWICE: typed_x_at_y adds Duration::seconds(
      // x_at_y as i64) — toward zero — and typed_y_at_x takes num_seconds()
      // of the difference (time_curve.rs:80-97), so every percentile
      // evaluates the departure CDF at a WHOLE-second offset
      val arrivalAbs = arrRef + xAtY(arrival, p / 100.0f).toLong
      val missProb = yAtX(departure, (arrivalAbs - depRef).toLong.toFloat)
      totalMiss += (missProb / 100.0f).toDouble
      p += 1
    }
    1.0 - totalMiss
  }

  /** Synthetic walk-time CDF from an air-line distance
    * (journey_data.rs:558-594): cos-shaped pseudo-normal between a sprint
    * bound (3.5 m/s + 10 s) and a slow-walk bound (0.8 m/s × detour factor
    * 1.4-1.8 + 45 s); < 20 m → uniform ±12 s. */
  def walkTimeCurve(distanceMeters: Float): Curve = {
    if (distanceMeters < 20.0f)
      return Array(CPoint(-12.0f, 0f), CPoint(12.0f, 1f))
    val minDistanceFactor = 1.0f
    val maxDistanceFactor =
      1.4f + math.max(0.0f, math.min(0.4f, (500.0f - distanceMeters) / 500.0f * 0.4f))
    val minWalkSpeed = 0.8f
    val maxSprintSpeed = 3.5f
    val minDelay = 10.0f
    val maxDelay = 45.0f
    val minDuration = distanceMeters * minDistanceFactor / maxSprintSpeed + minDelay
    val maxDuration = distanceMeters * maxDistanceFactor / minWalkSpeed + maxDelay
    val pi = math.Pi.toFloat
    val points = (0 to 100 by 5).map { p =>
      val duration = minDuration + (maxDuration - minDuration) * p / 100.0f
      val scaledX = pi + pi * p / 100.0f
      val c = math.cos(scaledX).toFloat
      val y = (math.sqrt(math.abs(c)).toFloat * math.signum(c) + 1.0f) / 2.0f
      CPoint(duration, y)
    }.toArray
    simplify(points, 0.01f)
  }

  /** Percentile extraction for prediction rows
    * (prediction_result.rs:40-47): delays at p ∈ {1,5,25,50,75,95,99}%. */
  val PredictionPercentiles: Array[Float] =
    Array(0.01f, 0.05f, 0.25f, 0.50f, 0.75f, 0.95f, 0.99f)

  def percentiles(c: Curve): Array[Float] =
    PredictionPercentiles.map(p => xAtY(c, p))
}
