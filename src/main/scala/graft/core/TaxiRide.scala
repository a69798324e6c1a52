package graft.core

import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** The central taxi stream record
  * (reference datastream_java/datatypes/TaxiRide.java:62-70). Identity /
  * equality in the reference is by rideId only (TaxiRide.java:132-141) —
  * dedup of rides is dedup by id.
  */
case class TaxiRide(
    rideId: Long,
    isStart: Boolean,
    startTime: Timestamp,
    endTime: Timestamp,
    startLon: Float,
    startLat: Float,
    endLon: Float,
    endLat: Float,
    passengerCnt: Short) {

  /** Event time: START events are timestamped at startTime, END events at
    * endTime (TaxiRideSource.getEventTime, TaxiRideSource.java:222-229).
    */
  def eventTime: Timestamp = if (isStart) startTime else endTime

  /** CSV layout of TaxiRide.toString (TaxiRide.java:72-95) — note the
    * event-time-first field swap: START rows carry (startTime, endTime),
    * END rows carry (endTime, startTime) (SURVEY §7.4.1).
    */
  def toCsvString: String = {
    val (t1, t2) =
      if (isStart) (startTime, endTime) else (endTime, startTime)
    val typ = if (isStart) "START" else "END"
    s"$rideId,$typ,${TaxiRide.fmt(t1)},${TaxiRide.fmt(t2)}," +
      s"$startLon,$startLat,$endLon,$endLat,$passengerCnt"
  }
}

object TaxiRide {
  /** Timestamps are UTC, pattern yyyy-MM-dd HH:mm:ss (TaxiRide.java:42-43). */
  val TimePattern = "yyyy-MM-dd HH:mm:ss"
  private val formatter = DateTimeFormatter.ofPattern(TimePattern)

  def fmt(t: Timestamp): String =
    LocalDateTime.ofEpochSecond(t.getTime / 1000, 0, ZoneOffset.UTC).format(formatter)

  private def parseTs(s: String): Timestamp =
    Timestamp.from(LocalDateTime.parse(s, formatter).toInstant(ZoneOffset.UTC))

  private def parseCoord(s: String): Float =
    if (s.isEmpty) 0.0f else s.toFloat // blank lon/lat → 0.0f (TaxiRide.java:119-122)

  /** Inverse of toCsvString, mirroring the START/END time swap
    * (TaxiRide.java:97-130).
    */
  def fromString(line: String): TaxiRide = {
    val t = line.split(",", -1)
    require(t.length == 9, s"Invalid record: $line")
    val isStart = t(1) match {
      case "START" => true
      case "END"   => false
      case _       => throw new IllegalArgumentException(s"Invalid record: $line")
    }
    val (startTime, endTime) =
      if (isStart) (parseTs(t(2)), parseTs(t(3))) else (parseTs(t(3)), parseTs(t(2)))
    TaxiRide(t(0).toLong, isStart, startTime, endTime,
      parseCoord(t(4)), parseCoord(t(5)), parseCoord(t(6)), parseCoord(t(7)),
      t(8).toShort)
  }
}
