package graft.gtfs

import scala.collection.mutable.ArrayBuffer

/** Minimal GTFS-realtime `FeedMessage` protobuf codec (decode + encode).
  *
  * No protobuf runtime ships with this environment, so this implements the
  * protobuf wire format directly for the subset of fields the reference
  * consumes (/root/reference/src/importer/per_schedule_importer.rs:110-221,
  * FIXTURES.md §2). Field numbers follow the public GTFS-realtime spec
  * (gtfs-realtime.proto):
  *
  *   FeedMessage:    header=1, entity=2
  *   FeedHeader:     gtfs_realtime_version=1, incrementality=2, timestamp=3
  *   FeedEntity:     id=1, trip_update=3
  *   TripUpdate:     trip=1, stop_time_update=2
  *   TripDescriptor: trip_id=1, start_time=2, start_date=3, route_id=5
  *   StopTimeUpdate: stop_sequence=1, arrival=2, departure=3, stop_id=4
  *   StopTimeEvent:  delay=1 (sint-less int32), time=2
  *
  * The encoder exists for test-fixture generation (the reference ships no
  * .pb fixtures, SURVEY.md §5).
  */
object GtfsRtCodec {

  final case class StopTimeEvent(delay: Option[Int], time: Option[Long])
  final case class StopTimeUpdate(stopSequence: Option[Int], stopId: Option[String],
                                  arrival: Option[StopTimeEvent], departure: Option[StopTimeEvent])
  final case class TripDescriptor(tripId: Option[String], routeId: Option[String],
                                  startTime: Option[String], startDate: Option[String])
  final case class TripUpdate(trip: TripDescriptor, stopTimeUpdates: Seq[StopTimeUpdate])
  final case class FeedMessage(timestamp: Option[Long], tripUpdates: Seq[TripUpdate])

  // ---------------- wire-format primitives ----------------

  /** Raised on truncated/corrupt input; callers decode per-file and skip the
    * bad file instead of failing the job (importer error path skips bad
    * entities/files individually). */
  final class MalformedProtobufException(msg: String) extends RuntimeException(msg)

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        if (pos >= buf.length) throw new MalformedProtobufException("truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new MalformedProtobufException("varint exceeds 64 bits")
    }
    def readLengthDelimited(): Array[Byte] = {
      val len = readVarint().toInt
      if (len < 0 || len > buf.length - pos)
        throw new MalformedProtobufException(s"length $len exceeds remaining ${buf.length - pos} bytes")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    private def advance(n: Int): Unit = {
      if (n > buf.length - pos)
        throw new MalformedProtobufException("truncated fixed-width field")
      pos += n
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => advance(8)
      case 2 => { val len = readVarint().toInt
        if (len < 0) throw new MalformedProtobufException(s"negative length $len")
        advance(len) }
      case 5 => advance(4)
      case other => throw new MalformedProtobufException(s"unsupported wire type $other")
    }
  }

  private def fields(bytes: Array[Byte]): Iterator[(Int, Int, Either[Long, Array[Byte]])] =
    new Iterator[(Int, Int, Either[Long, Array[Byte]])] {
      private val r = new Reader(bytes)
      def hasNext: Boolean = r.hasMore
      def next(): (Int, Int, Either[Long, Array[Byte]]) = {
        val tag = r.readVarint()
        val fieldNo = (tag >> 3).toInt
        val wt = (tag & 7).toInt
        wt match {
          case 0 => (fieldNo, wt, Left(r.readVarint()))
          case 2 => (fieldNo, wt, Right(r.readLengthDelimited()))
          case _ => { r.skip(wt); (fieldNo, wt, Left(0L)) }
        }
      }
    }

  /** int32 fields arrive as sign-extended varints; narrow to Int. */
  private def asInt32(v: Long): Int = v.toInt

  // ---------------- decode ----------------

  private def decodeEvent(b: Array[Byte]): StopTimeEvent = {
    var delay: Option[Int] = None; var time: Option[Long] = None
    fields(b).foreach {
      case (1, 0, Left(v)) => delay = Some(asInt32(v))
      case (2, 0, Left(v)) => time = Some(v)
      case _ =>
    }
    StopTimeEvent(delay, time)
  }

  private def decodeStopTimeUpdate(b: Array[Byte]): StopTimeUpdate = {
    var seq: Option[Int] = None; var stopId: Option[String] = None
    var arr: Option[StopTimeEvent] = None; var dep: Option[StopTimeEvent] = None
    fields(b).foreach {
      case (1, 0, Left(v)) => seq = Some(asInt32(v))
      case (2, 2, Right(m)) => arr = Some(decodeEvent(m))
      case (3, 2, Right(m)) => dep = Some(decodeEvent(m))
      case (4, 2, Right(sb)) => stopId = Some(new String(sb, "UTF-8"))
      case _ =>
    }
    StopTimeUpdate(seq, stopId, arr, dep)
  }

  private def decodeTripDescriptor(b: Array[Byte]): TripDescriptor = {
    var tripId, routeId, startTime, startDate: Option[String] = None
    fields(b).foreach {
      case (1, 2, Right(v)) => tripId = Some(new String(v, "UTF-8"))
      case (2, 2, Right(v)) => startTime = Some(new String(v, "UTF-8"))
      case (3, 2, Right(v)) => startDate = Some(new String(v, "UTF-8"))
      case (5, 2, Right(v)) => routeId = Some(new String(v, "UTF-8"))
      case _ =>
    }
    TripDescriptor(tripId, routeId, startTime, startDate)
  }

  private def decodeTripUpdate(b: Array[Byte]): TripUpdate = {
    var trip = TripDescriptor(None, None, None, None)
    val stus = new ArrayBuffer[StopTimeUpdate]()
    fields(b).foreach {
      case (1, 2, Right(v)) => trip = decodeTripDescriptor(v)
      case (2, 2, Right(v)) => stus += decodeStopTimeUpdate(v)
      case _ =>
    }
    TripUpdate(trip, stus.toSeq)
  }

  def decode(bytes: Array[Byte]): FeedMessage = {
    var ts: Option[Long] = None
    val updates = new ArrayBuffer[TripUpdate]()
    fields(bytes).foreach {
      case (1, 2, Right(header)) =>
        fields(header).foreach {
          case (3, 0, Left(v)) => ts = Some(v)
          case _ =>
        }
      case (2, 2, Right(entity)) =>
        fields(entity).foreach {
          case (3, 2, Right(tu)) => updates += decodeTripUpdate(tu)
          case _ =>
        }
      case _ =>
    }
    FeedMessage(ts, updates.toSeq)
  }

  // ---------------- encode (test fixtures) ----------------

  private final class Writer {
    val out = new ArrayBuffer[Byte]()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
    }
    def tag(fieldNo: Int, wt: Int): Unit = varint((fieldNo.toLong << 3) | wt)
    // protobuf int32: negatives go out as 10-byte sign-extended varints,
    // which `varint(v.toLong)` produces naturally.
    def int64Field(fieldNo: Int, v: Long): Unit = { tag(fieldNo, 0); varint(v) }
    def bytesField(fieldNo: Int, b: Array[Byte]): Unit = { tag(fieldNo, 2); varint(b.length); out ++= b }
    def stringField(fieldNo: Int, s: String): Unit = bytesField(fieldNo, s.getBytes("UTF-8"))
    def toArray: Array[Byte] = out.toArray
  }

  private def encodeEvent(e: StopTimeEvent): Array[Byte] = {
    val w = new Writer
    e.delay.foreach(d => w.int64Field(1, d.toLong))
    e.time.foreach(t => w.int64Field(2, t))
    w.toArray
  }

  private def encodeStu(u: StopTimeUpdate): Array[Byte] = {
    val w = new Writer
    u.stopSequence.foreach(sq => w.int64Field(1, sq.toLong))
    u.arrival.foreach(a => w.bytesField(2, encodeEvent(a)))
    u.departure.foreach(d => w.bytesField(3, encodeEvent(d)))
    u.stopId.foreach(s => w.stringField(4, s))
    w.toArray
  }

  private def encodeTrip(t: TripDescriptor): Array[Byte] = {
    val w = new Writer
    t.tripId.foreach(s => w.stringField(1, s))
    t.startTime.foreach(s => w.stringField(2, s))
    t.startDate.foreach(s => w.stringField(3, s))
    t.routeId.foreach(s => w.stringField(5, s))
    w.toArray
  }

  def encode(msg: FeedMessage): Array[Byte] = {
    val w = new Writer
    val header = new Writer
    header.stringField(1, "2.0")
    msg.timestamp.foreach(ts => header.int64Field(3, ts))
    w.bytesField(1, header.toArray)
    msg.tripUpdates.zipWithIndex.foreach { case (tu, i) =>
      val entity = new Writer
      entity.stringField(1, i.toString)
      val tuW = new Writer
      tuW.bytesField(1, encodeTrip(tu.trip))
      tu.stopTimeUpdates.foreach(stu => tuW.bytesField(2, encodeStu(stu)))
      entity.bytesField(3, tuW.toArray)
      w.bytesField(2, entity.toArray)
    }
    w.toArray
  }
}
