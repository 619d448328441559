package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The harness text_pii query plants synthetic PII (the star-schema corpus
  * has none); this spec exercises the same regex/redaction pipeline on
  * realistic strings.
  */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private def piiOf(text: String): (Long, Long, Long, String) = {
    val df = Seq(text).toDF("t")
    val scored = CurationQueries.piiColumns(col("t"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val r = scored.select("n_emails", "n_ips", "n_longnums", "redacted").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("detects and redacts emails, IPv4 addresses, and long digit runs") {
    val (e, ip, num, red) = piiOf(
      "write to jane.doe+spam@mail.example.co.uk or admin@例え.jp from " +
        "192.168.10.254, card 4111111111111111 expires soon")
    assert(e === 1L) // the unicode-domain address is NOT a match (ASCII re)
    assert(ip === 1L)
    assert(num === 1L)
    assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<NUM>"))
    assert(!red.contains("jane.doe") && !red.contains("192.168.10.254")
      && !red.contains("4111111111111111"))
  }

  test("redaction order: email digits are not double-counted as numbers") {
    val (e, ip, num, red) = piiOf("reach user123456789@example.com today")
    assert(e === 1L)
    assert(ip === 0L)
    // the 9-digit run sits inside the email; counting happens on the raw
    // text so it IS seen by the digit regex, but redaction replaces the
    // email first, so the output carries a single <EMAIL> and no <NUM>
    assert(num === 1L)
    assert(red === "reach <EMAIL> today")
  }

  test("clean text passes through untouched") {
    val s = "no pii here, just words and a date 2026-08-12 and v1.2.3"
    val (e, ip, num, red) = piiOf(s)
    assert((e, ip, num) === ((0L, 0L, 0L)))
    assert(red === s)
  }

  test("ipv4 requires word boundaries and exactly four octets") {
    val (_, ip, _, _) = piiOf("versions 1.2.3 and 1.2.3.4.5 and ok 8.8.8.8")
    // 1.2.3 has three octets; 1.2.3.4.5 still contains a 4-octet prefix
    // match (documented: the regex is a detector, not a validator)
    assert(ip === 2L)
  }
}
