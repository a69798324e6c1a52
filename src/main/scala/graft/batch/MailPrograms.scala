package graft.batch

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Mail
import graft.functions.TextFunctions.StopWords

/** The four batch mail exercises over Dataset[Mail], reference-exact
  * (SURVEY §2: MailCount, MailTFIDF, ReplyGraph, MemberOTMonth).
  * Everything is declarative DataFrame code — Catalyst provides the
  * column pruning / filter pushdown the reference configured by hand
  * (SURVEY §4), and both joins broadcast their bounded side.
  */
object MailPrograms {

  /** Email extraction: the address between the last '<' and the trailing
    * '>' (MailCount.java:77).
    */
  private def email(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "<([^<>]*)>$", 1)

  /** Month key: substring(0,7) of yyyy-MM-dd-HH:mm:ss → "yyyy-MM"
    * (MailCount.java:75; SURVEY §7.4.7).
    */
  private def month(c: org.apache.spark.sql.Column) = substring(c, 1, 7)

  /** MailCount (dataset_java/mail_count/MailCount.java:49-107): mails per
    * (month, email address).
    */
  def mailCount(mails: Dataset[Mail]): DataFrame = {
    import mails.sparkSession.implicits._
    mails.select(month($"time").as("month"), email($"sender").as("email"))
      .groupBy($"month", $"email")
      .agg(count(lit(1)).as("cnt"))
  }

  /** MailTFIDF (dataset_java/tf_idf/MailTFIDF.java:56-97): per-mail TF-IDF
    * with the exact no-logarithm formula tf * (mailCount / df)
    * (MailTFIDF.java:230; SURVEY §7.4.2). Tokenizer: lowercase whitespace
    * split, alphabetic-only, 29-word stop list (P10).
    */
  def mailTfIdf(mails: Dataset[Mail]): DataFrame = {
    import mails.sparkSession.implicits._
    val stop = typedLit(StopWords)
    val toks = mails.select($"messageId",
      filter(split(lower($"body"), "\\s+"), t =>
        t.rlike("\\A[a-z]+\\z") && !array_contains(stop, t)).as("ws"))
      .cache()
    val mailCnt = toks.count() // separate eager job, closed-over scalar (A3)
    val exploded = toks.select($"messageId", explode($"ws").as("word"))
    val tf = exploded.groupBy($"messageId", $"word").agg(count(lit(1)).as("tf"))
    val df = exploded.distinct().groupBy($"word").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "word")
      .select($"messageId", $"word",
        ($"tf" * (lit(mailCnt.toDouble) / $"df")).as("tfidf"))
  }

  /** Bot addresses excluded by ReplyGraph (ReplyGraph.java:61-62) — note
    * the list deliberately differs from MemberOTMonth's (SURVEY §7.4.8).
    */
  val ReplyGraphBots: Seq[String] = Seq("git@git.apache.org", "jira@apache.org")

  /** ReplyGraph (dataset_java/reply_graph/ReplyGraph.java:50-124):
    * reply connections (child sender → parent sender) via the
    * replyTo = messageId self-join, then pair counts.
    */
  def replyGraph(mails: Dataset[Mail]): DataFrame = {
    import mails.sparkSession.implicits._
    val m = mails
      .select($"messageId", email($"sender").as("sender"), $"replyTo")
      .filter(!$"sender".isin(ReplyGraphBots: _*))
    m.as("c").join(m.as("p"), $"c.replyTo" === $"p.messageId")
      .groupBy($"c.sender".as("from"), $"p.sender".as("to"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bot addresses excluded by MemberOTMonth (MemberOTMonth.java:68-70). */
  val MemberOtmBots: Seq[String] =
    Seq("jira@apache.org", "no-reply@apache.org", "git@git.apache.org")

  /** MemberOTMonth (table_java/memberotm/MemberOTMonth.java:41-83): the
    * member with the most mails per month — argmax keeping ties, so
    * `rank`, not `row_number` (SURVEY §7.4.3).
    */
  def memberOTMonth(mails: Dataset[Mail]): DataFrame = {
    import mails.sparkSession.implicits._
    val counts = mails
      .select(month($"time").as("month"), email($"sender").as("sender"))
      .filter(!$"sender".isin(MemberOtmBots: _*))
      .groupBy($"month", $"sender")
      .agg(count(lit(1)).as("cnt"))
    // tie-preserving argmax as a broadcast max-join (the reference's own
    // max-then-join shape) — a rank() window here would sort a month's
    // whole sender population through one partition at corpus scale
    val mx = counts.groupBy($"month").agg(max($"cnt").as("__mx"))
    counts.join(broadcast(mx), "month")
      .filter($"cnt" === $"__mx")
      .select($"month", $"sender")
  }
}
