package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curves.{CPoint, Curves}

class PairCurveSetAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def quant(v: Int): Float = (v / 12 * 12).toFloat

  test("aggregator output equals Curves.makeCurveSet on random pair groups") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0 until 6
      _ <- 0 until (15 + rnd.nextInt(300)) // some groups below the >20 gate
    } yield (g, quant(rnd.nextInt(900) - 200), quant(rnd.nextInt(1100) - 300))

    val agg = rows.toDF("g", "d_s", "d_e")
      .groupBy("g")
      .agg(PairCurveSetAggregator.curveSet(col("d_s"), col("d_e")).as("cs"))
      .collect()
      .map { r =>
        val cs = r.getStruct(1)
        val entries = cs.getSeq[org.apache.spark.sql.Row](0).map { e =>
          (e.getFloat(0), e.getSeq[org.apache.spark.sql.Row](1)
            .map(p => CPoint(p.getFloat(0), p.getFloat(1))).toArray)
        }
        r.getInt(0) -> ((entries, cs.getInt(1)))
      }
      .toMap

    rows.groupBy(_._1).foreach { case (g, vs) =>
      val pairs = vs.map(v => (v._2, v._3))
      val (entries, sampleSize) = agg(g)
      if (pairs.length <= 20) {
        assert(entries.isEmpty, s"group $g below gate must be empty")
      } else {
        val expected = Curves.makeCurveSet(pairs)
        expected match {
          case None => assert(entries.isEmpty)
          case Some((set, n)) =>
            assert(sampleSize == n, s"group $g sample_size")
            assert(entries.length == set.length, s"group $g curve count")
            entries.zip(set).foreach { case ((fa, ca), (fb, cb)) =>
              assert(fa == fb, s"group $g focus")
              assert(ca.length == cb.length, s"group $g point count at focus $fa")
              ca.zip(cb).foreach { case (a, b) =>
                assert(a.x == b.x && math.abs(a.y - b.y) < 1e-5f,
                  s"group $g focus $fa: $a vs $b")
              }
            }
        }
      }
    }
  }

  test("PairCellMap: growth, zero key, merge, kryo round-trip") {
    val rnd = new scala.util.Random(3)
    val ref = scala.collection.mutable.Map[Long, Long]()
    val m = new PairCellMap()
    // includes key 0 (the (+0f, +0f) pair) and forces several growths
    val keys = (0L +: Array.fill(500)(rnd.nextLong())).distinct
    keys.foreach { k =>
      val c = 1L + rnd.nextInt(5)
      m.add(k, c)
      ref.update(k, ref.getOrElse(k, 0L) + c)
      if (rnd.nextBoolean()) { m.add(k, 2L); ref.update(k, ref(k) + 2L) }
    }
    def cells(p: PairCellMap): Map[Long, Long] = {
      val b = Map.newBuilder[Long, Long]
      p.foreachCell((k, c) => b += k -> c)
      b.result()
    }
    assert(cells(m) == ref.toMap)
    assert(m.totalCount == ref.values.sum)
    assert(m.cellCount == ref.size)

    // merge disjoint + overlapping
    val m2 = new PairCellMap()
    m2.add(0L, 7L); m2.add(keys(1), 3L); m2.add(999999L, 1L)
    m2.foreachCell((k, c) => m.add(k, c))
    assert(m.totalCount == ref.values.sum + 11L)

    // kryo round-trip writes only live cells and restores them exactly
    val kryo = new com.esotericsoftware.kryo.Kryo()
    kryo.setRegistrationRequired(false)
    val out = new com.esotericsoftware.kryo.io.Output(1 << 20)
    kryo.writeObject(out, m)
    val back = kryo.readObject(
      new com.esotericsoftware.kryo.io.Input(out.toBytes), classOf[PairCellMap])
    assert(cells(back) == cells(m) && back.totalCount == m.totalCount)
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val df = spark.range(2000).select((col("id") % 5).as("g"),
      (col("id") % 17 * 12).cast("float").as("d_s"),
      (col("id") % 23 * 12).cast("float").as("d_e"))
      .groupBy("g")
      .agg(PairCurveSetAggregator.curveSet(col("d_s"), col("d_e")).as("cs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"object aggregate expected in:\n$plan")
    val aggCount = "(ObjectHashAggregate|SortAggregate)".r.findAllIn(plan).length
    assert(aggCount >= 2, s"partial+final aggregation expected, got $aggCount")
  }
}
