package graft.llm

import graft.SparkSpec

class RedactSpec extends SparkSpec {

  private def run(text: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val r = Redact.withRedactions(Seq((1L, text)).toDF("id", "t"), "t")
      .select("n_emails", "n_urls", "n_longnums", "redacted")
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("masks emails, urls, and long digit runs with typed tokens") {
    val (e, u, n, red) = run(
      "mail a.user+tag@sub.example.co.uk or visit https://example.org/p?q=1 ref 12345678 done")
    assert((e, u, n) === (1, 1, 1))
    assert(red === "mail <EMAIL> or visit <URL> ref <NUM> done")
  }

  test("short digit runs and bare domains are NOT masked") {
    val (e, u, n, red) = run("call 555 1234 at example.com room 42")
    assert((e, u, n) === (0, 0, 0))
    assert(red === "call 555 1234 at example.com room 42")
  }

  test("digits inside an email mask once as the email, not twice") {
    val (e, _, n, red) = run("id 99887766 mail user99887766@host.io end")
    assert(e === 1)
    assert(n === 2) // counts run on the ORIGINAL text: both digit runs
    assert(red === "id <NUM> mail <EMAIL> end")
  }

  test("multiple occurrences all mask") {
    val (e, u, _, red) = run("a@b.co c@d.co http://x.io http://y.io")
    assert((e, u) === (2, 2))
    assert(red === "<EMAIL> <EMAIL> <URL> <URL>")
  }
}
