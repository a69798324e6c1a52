package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.batch.MailPrograms
import graft.sources.MailSource

class MailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val mails = MailSource.readMailRecords(spark,
    getClass.getResource("/mails.txt").getPath).cache()

  test("delimited scan reads all 12 records with 6 fields") {
    val rows = mails.collect()
    assert(rows.length == 12)
    assert(rows.forall(_.messageId.startsWith("<")))
    assert(rows.count(_.replyTo != "null") == 6)
  }

  test("MailCount: mails per (month, email) — golden") {
    import spark.implicits._
    val got = MailPrograms.mailCount(mails)
      .as[(String, String, Long)].collect().toSet
    val expected = Set(
      ("2014-06", "alice@apache.org", 3L),
      ("2014-06", "bob@apache.org", 2L),
      ("2014-06", "jira@apache.org", 1L),
      ("2014-06", "git@git.apache.org", 1L),
      ("2014-07", "alice@apache.org", 2L),
      ("2014-07", "bob@apache.org", 2L),
      ("2014-07", "no-reply@apache.org", 1L))
    assert(got == expected)
  }

  test("MemberOTMonth keeps ties (rank, not row_number — SURVEY §7.4.3)") {
    import spark.implicits._
    val got = MailPrograms.memberOTMonth(mails).as[(String, String)].collect().toSet
    assert(got == Set(
      ("2014-06", "alice@apache.org"),
      ("2014-07", "alice@apache.org"),
      ("2014-07", "bob@apache.org")))
  }

  test("ReplyGraph: reply pairs with 2-address bot filter — golden") {
    import spark.implicits._
    val got = MailPrograms.replyGraph(mails).as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("bob@apache.org", "alice@apache.org", 4L),
      ("alice@apache.org", "bob@apache.org", 1L)))
  }

  test("MailTFIDF uses tf * N/df with no logarithm (MailTFIDF.java:230)") {
    import spark.implicits._
    val got = MailPrograms.mailTfIdf(mails)
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // "watermark": in m4 and m5 once each → df=2, N=12 → tfidf = 1 * 12/2 = 6
    assert(got(("<m4@apache.org>", "watermark")) == 6.0)
    assert(got(("<m5@apache.org>", "watermark")) == 6.0)
    // stop words never appear
    assert(!got.keySet.exists(_._2 == "the"))
    // non-alphabetic tokens are dropped ("42", "work?")
    assert(!got.keySet.exists(_._2 == "42"))
  }

  test("mbox parse: state machine, continuation unwrap, dedup, drop-invalid") {
    val parsed = MailSource.readMbox(spark,
      getClass.getResource("/sample.mbox").getPath).collect()
    // x1, one-of-the-two x2; the subject-less x4 is dropped
    assert(parsed.map(_.messageId).toSet == Set("<x1@apache.org>", "<x2@apache.org>"))
    val x1 = parsed.find(_.messageId == "<x1@apache.org>").get
    assert(x1.time == "2014-01-09-10:37:12")
    assert(x1.sender == "Alice <alice@apache.org>")
    assert(x1.replyTo == "null")
    // '='-continuation joined without the '='
    assert(x1.body.contains("equals sign continues here"))
  }
}
