package graft

import org.scalatest.funsuite.AnyFunSuite

class AppsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark // apps getOrCreate() onto this session

  test("app mains run end-to-end through their CLI argument path") {
    val mails = getClass.getResource("/mails.txt").getPath
    val taxi = getClass.getResource("/taxi_rides.csv").getPath
    graft.apps.MailCount.main(Array("--input", mails))
    graft.apps.MemberOTMonth.main(Array("--input", mails))
    graft.apps.RideCleansing.main(Array("--input", taxi))
    graft.apps.TravelTimePrediction.main(Array("--input", taxi))
    val out = java.nio.file.Files.createTempDirectory("graft_app_").toString
    graft.apps.PopularPlacesToES.main(Array("--input", taxi, "--output", s"$out/es"))
    assert(new java.io.File(s"$out/es").exists())
  }

  test("missing required parameter fails with a clear message") {
    val e = intercept[RuntimeException] {
      graft.apps.MailCount.main(Array("--wrong", "x"))
    }
    assert(e.getMessage.contains("--input"))
  }
}
