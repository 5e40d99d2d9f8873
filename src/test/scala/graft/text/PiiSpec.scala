package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(texts: Seq[String]) = {
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "s", t) }
      .toDF("doc_id", "source", "aug")
    Pii.detectorsOf(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("detectors find phone / IPv4 / Luhn-valid card and reject bad checksums") {
    val m = run(Seq(
      "call (415) 555-0199 after lunch",            // phone
      "host 192.168.1.77 went dark",                // IPv4
      "card 4111111111111111 on file",              // the classic Luhn-valid test PAN
      "card 4111111111111112 on file",              // checksum off by one
      "digits 123 and 45.6 but no pii here",
      "mail me at jane.doe+spam@corp.example.org today"))
    assert(m(0L).getAs[scala.collection.Seq[String]]("phones") == scala.collection.Seq("(415) 555-0199"))
    assert(m(5L).getAs[scala.collection.Seq[String]]("emails") ==
      scala.collection.Seq("jane.doe+spam@corp.example.org"))
    assert(m(5L).getAs[Int]("residual") == 0 &&
      m(5L).getAs[String]("scrubbed").contains("[EMAIL]"))
    assert(m(1L).getAs[scala.collection.Seq[String]]("ips") == scala.collection.Seq("192.168.1.77"))
    assert(m(2L).getAs[scala.collection.Seq[String]]("ccs") == scala.collection.Seq("4111111111111111"))
    assert(m(2L).getAs[Int]("cc_valid") == 1)
    assert(m(3L).getAs[scala.collection.Seq[String]]("ccs").nonEmpty, "candidate still detected")
    assert(m(3L).getAs[Int]("cc_valid") == 0, "Luhn must reject the bad check digit")
    assert(m(4L).getAs[scala.collection.Seq[String]]("phones").isEmpty
      && m(4L).getAs[scala.collection.Seq[String]]("ips").isEmpty
      && m(4L).getAs[scala.collection.Seq[String]]("ccs").isEmpty
      && m(4L).getAs[scala.collection.Seq[String]]("emails").isEmpty)
  }

  test("Luhn property: random PANs validate, any single-digit mutation is rejected") {
    // independent textbook reimplementation of the checksum as the
    // test oracle (the shipped detector is a SQL HOF fold)
    def luhnOk(pan: String): Boolean = {
      val s = pan.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum
      s % 10 == 0
    }
    val rnd = new scala.util.Random(42) // fixed seed: deterministic test
    val pans = (1 to 25).map { _ =>
      val payload = (1 to 15).map(_ => rnd.nextInt(10)).mkString
      val s = (payload + "0").reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum
      payload + ((10 - s % 10) % 10)
    }
    pans.foreach(p => assert(luhnOk(p), s"test-oracle self-check failed for $p"))
    val mutated = pans.map { p =>
      val i = rnd.nextInt(16)
      val d = p(i) - '0'
      val nd = (d + 1 + rnd.nextInt(9)) % 10 // any digit but the original
      p.updated(i, ('0' + nd).toChar)
    }
    val texts = pans.map(p => s"card $p on file") ++
      mutated.map(p => s"card $p on file")
    val m = run(texts)
    pans.indices.foreach { i =>
      assert(m(i.toLong).getAs[Int]("cc_valid") == 1,
        s"valid PAN ${pans(i)} rejected by the shipped detector")
    }
    mutated.indices.foreach { i =>
      val row = m((pans.length + i).toLong)
      assert(row.getAs[scala.collection.Seq[String]]("ccs").nonEmpty)
      assert(row.getAs[Int]("cc_valid") == 0,
        s"mutated PAN ${mutated(i)} passed the shipped detector")
    }
  }

  test("redaction round-trip: scrubbed text has zero residual detections") {
    val m = run(Seq(
      "reach me at (212) 555-7788 or 10.0.0.1, card 4111111111111111",
      "two phones (303) 555-0000 (303) 555-0001 and ip 255.255.255.255"))
    m.values.foreach { r =>
      assert(r.getAs[Int]("residual") == 0, s"residual in: ${r.getAs[String]("scrubbed")}")
    }
    val s0 = m(0L).getAs[String]("scrubbed")
    assert(s0.contains("[PHONE]") && s0.contains("[IP]") && s0.contains("[CC]"))
    assert(!s0.exists(_.isDigit) || !s0.matches(""".*\d{4}.*"""),
      s"long digit runs survived: $s0")
    assert(m(1L).getAs[String]("scrubbed")
      .sliding("[PHONE]".length).count(_ == "[PHONE]") == 2)
  }

  test("corpus report: every injected arm lands, rates bounded, scrub verified") {
    val rows = Pii.qPiiReport(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val totals = rows.map(r => (r.getAs[Long]("phone_hits"), r.getAs[Long]("ip_hits"),
      r.getAs[Long]("cc_candidates"), r.getAs[Long]("cc_valid"),
      r.getAs[Long]("residual_hits"), r.getAs[Long]("email_hits")))
    assert(totals.map(_._1).sum > 0, "phone arm missing")
    assert(totals.map(_._2).sum > 0, "ip arm missing")
    assert(totals.map(_._6).sum > 0, "email arm missing")
    val (cand, valid) = (totals.map(_._3).sum, totals.map(_._4).sum)
    assert(cand > 0 && valid > 0 && valid < cand,
      s"Luhn filter must split candidates: $valid of $cand")
    assert(totals.map(_._5).sum == 0, "scrub left residual PII")
    rows.foreach { r =>
      val rate = r.getAs[Double]("pii_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }
}
