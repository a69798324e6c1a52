package graft.sources

import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Mail

/** Mail sources (reference S3/S5/P11).
  *
  * S3 — delimited mail records with multi-char delimiters: Spark CSV has
  * no multi-char lineSep, but the text source does (SURVEY §2.1 S3), so:
  * text(lineSep="##//##") → split on quoted "#|#" → named columns. Column
  * pruning after the split is Catalyst's job (manual `includeFields`
  * bitmasks of the reference are obsolete, SURVEY §4).
  *
  * S5/P11 — raw mbox: text(lineSep="From dev-return") re-attaching the
  * chopped delimiter (MBoxParser.java:104-114), then the header state
  * machine as a typed flatMap (one mail in, 0-or-1 records out).
  */
object MailSource {

  val MailDaemonPrefix = "dev-return" // MBoxParser.java:59
  private val NewMailPrefix = "From " + MailDaemonPrefix

  /** S3: delimited mail-record scan → typed Dataset[Mail]. */
  def readMailRecords(spark: SparkSession, path: String): Dataset[Mail] = {
    import spark.implicits._
    val parts = split(col("value"), Pattern.quote(Mail.FieldDelim))
    spark.read.option("lineSep", Mail.RecordDelim).text(path)
      // keep only complete 6-field records (note: Spark `trim` strips
      // spaces, not newlines — the empty tail record after the final
      // delimiter is "\n", so field-count is the robust guard)
      .filter(size(parts) === 6)
      .select(
        trim(element_at(parts, 1)).as("messageId"),
        element_at(parts, 2).as("time"),
        element_at(parts, 3).as("sender"),
        element_at(parts, 4).as("subject"),
        element_at(parts, 5).as("body"),
        element_at(parts, 6).as("replyTo"))
      .as[Mail]
  }

  private val inDF = DateTimeFormatter.ofPattern("EEE MMM d HH:mm:ss yyyy", Locale.US)
  private val outDF = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH:mm:ss", Locale.US)

  /** P11: parse one raw mbox mail into 0-or-1 records — header state
    * machine with From/Subject/Message-ID/In-Reply-To extraction, body =
    * lines after the first blank line, '='-continuation unwrapping, date
    * re-format, and drop-if-delimiter-contained semantics
    * (MBoxParser.java:140-226). Reimplemented in Scala from the observed
    * behavior; same output contract.
    */
  def parseMbox(mail: String): Option[Mail] = {
    def containsDelim(s: String) =
      s.contains(Mail.FieldDelim) || s.contains(Mail.RecordDelim)

    var bodyStarted = false
    val body = new StringBuilder
    var time: String = null
    var from: String = null
    var subject: String = null
    var messageId: String = null
    var replyTo: String = "null"

    for (line <- mail.split("\n")) {
      if (!bodyStarted && line.trim.isEmpty) bodyStarted = true
      if (bodyStarted) {
        if (line.endsWith("=")) body.append(line.substring(0, line.length - 1))
        else body.append(line).append('\n')
      } else if (line.startsWith(NewMailPrefix)) {
        if (line.length < 24) return None
        val dateStr = line.substring(line.length - 24).replaceAll("\\s+", " ")
        // strict java.time cross-checks the weekday against the date and
        // THROWS on forged Date headers (real archives contain them);
        // the contract here is 0-or-1 Option — a malformed mail drops,
        // it must never kill the whole read job
        time = scala.util.Try(
          LocalDateTime.parse(dateStr, inDF).atOffset(ZoneOffset.UTC)
            .format(outDF)).getOrElse(return None)
      } else if (line.toLowerCase.startsWith("subject: ")) {
        subject = line.substring(9)
        if (containsDelim(subject)) return None
      } else if (line.toLowerCase.startsWith("from: ")) {
        from = line.substring(6)
        if (containsDelim(from)) return None
      } else if (line.toLowerCase.startsWith("message-id: ")) {
        messageId = line.substring(12)
        if (containsDelim(messageId)) return None
      } else if (line.toLowerCase.startsWith("in-reply-to: ")) {
        replyTo = line.substring(13)
        if (containsDelim(replyTo)) return None
      }
    }

    if (messageId != null && time != null && from != null && subject != null
        && bodyStarted && !containsDelim(body.toString))
      Some(Mail(messageId, time, from, subject, body.toString, replyTo))
    else None
  }

  /** S5 + P11 + A7: raw mbox files → parsed, id-deduplicated mail records
    * (the full MBoxParser main, MBoxParser.java:61-85).
    */
  def readMbox(spark: SparkSession, path: String): Dataset[Mail] = {
    import spark.implicits._
    spark.read.option("lineSep", NewMailPrefix).text(path)
      .filter(length(trim(col("value"))) > 0)
      // re-attach the delimiter the split chopped off (MBoxParser.java:104-114)
      .select(when(col("value").startsWith("From "), col("value"))
        .otherwise(concat(lit(NewMailPrefix), col("value"))).as("raw"))
      .as[String]
      .flatMap(parseMbox _)
      .dropDuplicates("messageId") // distinct(0), MBoxParser.java:80
  }
}
