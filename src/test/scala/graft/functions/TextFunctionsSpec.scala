package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).get(0)

  test("tokenCount: whitespace tokens, zero for blank") {
    assert(one(TF.tokenCount(col("t")), "the quick  brown\tfox") == 4)
    assert(one(TF.tokenCount(col("t")), "   ") == 0)
    assert(one(TF.tokenCount(col("t")), "") == 0)
    assert(one(TF.tokenCount(col("t")), "one") == 1)
  }

  test("tokens: lowercased, punctuation-split, empties dropped") {
    val got = one(TF.tokens(col("t")), "Hello, World! it's 42")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(got == Seq("hello", "world", "it's", "42"))
  }

  test("langId picks the language with most stopword hits") {
    assert(one(TF.langId(col("t")), "the cat sat on the mat and it is fine") == "en")
    assert(one(TF.langId(col("t")), "el gato y la casa que los perros") == "es")
    assert(one(TF.langId(col("t")), "der hund und die katze ist nicht da") == "de")
    assert(one(TF.langId(col("t")), "xyzzy qwerty") == "und")
  }

  test("qualityScore in [0,1]; higher for natural text than repeated junk") {
    val natural = one(TF.qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and it is a fine day for running")
      .asInstanceOf[Double]
    val junk = one(TF.qualityScore(col("t")), "zz zz zz zz zz zz zz zz @@@@ ####")
      .asInstanceOf[Double]
    assert(natural >= 0.0 && natural <= 1.0)
    assert(junk >= 0.0 && junk <= 1.0)
    assert(natural > junk)
  }

  test("chunks: stride windows with overlap, length-capped tail, empty-doc none") {
    import org.apache.spark.sql.functions.col
    // 10 tokens, chunk=4, overlap=1 → stride 3 → ceil(10/3)=4 chunks
    val text = "a b c d e f g h i j"
    val got = one(TextFunctions.chunks(col("t"), 4, 1), text)
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got == Seq("a b c d", "d e f g", "g h i j", "j"))
    // exact multiple: 9 tokens, stride 3 → 3 chunks, no stub
    val got2 = one(TextFunctions.chunks(col("t"), 4, 1), "a b c d e f g h i")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got2 == Seq("a b c d", "d e f g", "g h i"))
    // invalid params refused
    intercept[IllegalArgumentException] {
      TextFunctions.chunks(col("t"), 4, 4)
    }
  }

  test("redact replaces email/ssn/ip/phone with typed placeholders, in order") {
    import org.apache.spark.sql.functions.col
    val got = one(TextFunctions.redact(col("t")),
      "mail a.b+c@x.co.uk, ssn 123-45-6789, ip 10.0.42.7, tel +1 555 010 4477.")
      .asInstanceOf[String]
    assert(got == "mail <EMAIL>, ssn <ID>, ip <IP>, tel <PHONE>.")
    // clean text untouched
    assert(one(TextFunctions.redact(col("t")), "no pii here 2024")
      .asInstanceOf[String] == "no pii here 2024")
  }

  test("fingerprint: whitespace/case/punct-insensitive") {
    val a = one(TF.fingerprint(col("t")), "Hello,   WORLD!")
    val b = one(TF.fingerprint(col("t")), "hello world")
    val c = one(TF.fingerprint(col("t")), "goodbye world")
    assert(a == b)
    assert(a != c)
  }

  test("shingles: distinct char n-grams; short text -> empty") {
    val got = one(TF.shingles(col("t"), 3), "abcd")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(got == Seq("abc", "bcd"))
    assert(one(TF.shingles(col("t"), 5), "ab").asInstanceOf[scala.collection.Seq[String]].toSeq.isEmpty)
  }

  test("wordNgrams: sliding word windows; short -> empty") {
    val got = one(TF.wordNgrams(col("t"), 2), "a b c")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(got == Seq("a b", "b c"))
    assert(one(TF.wordNgrams(col("t"), 3), "a b").asInstanceOf[scala.collection.Seq[String]].toSeq.isEmpty)
  }

  test("urlParts: scheme/host/path/query; non-URL -> all empty") {
    def parts(s: String): (String, String, String, String) = {
      val r = one(TF.urlParts(col("t")), s).asInstanceOf[org.apache.spark.sql.Row]
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
    }
    assert(parts("https://w1.example.org/a/b?id=7&x=1#frag") ==
      (("https", "w1.example.org", "/a/b", "id=7&x=1")))
    assert(parts("http://host.com") == (("http", "host.com", "", "")))
    assert(parts("ftp://h:21/p") == (("ftp", "h:21", "/p", "")))
    assert(parts("not a url at all") == (("", "", "", "")))
    // '?' inside a fragment is NOT a query (RFC 3986); '?' in non-URL
    // text must not leak into the query either
    assert(parts("https://x.com/a#frag?notquery") ==
      (("https", "x.com", "/a", "")))
    assert(parts("what? really#x") == (("", "", "", "")))
  }

  test("embedText: unit vectors, identical in == identical out, monotone in overlap") {
    def embed(s: String): Seq[Float] =
      one(TF.embedText(col("t"), dim = 64), s)
        .asInstanceOf[scala.collection.Seq[Float]].toSeq
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = (0 until 20).map(i => s"word$i").mkString(" ")
    // determinism + canonicalization: same tokens => same vector, and
    // case/punctuation differences vanish (the MinHash convention)
    assert(embed(base) == embed(base))
    assert(embed(base) == embed(base.toUpperCase + "!!!"))
    // unit norm
    assert(math.abs(cos(embed(base), embed(base)) - 1.0) < 1e-5)
    // cosine decreases as more words are replaced with fresh ones
    def variant(k: Int): String =
      ((0 until k).map(i => s"zzrep${i}qq") ++
        (k until 20).map(i => s"word$i")).mkString(" ")
    val sims = Seq(2, 8, 16).map(k => cos(embed(base), embed(variant(k))))
    assert(sims == sims.sorted.reverse, s"not monotone: $sims")
    assert(sims.head > 0.7 && sims.last < 0.5)
    // disjoint token sets land near zero (signed hashing is zero-mean)
    val other = (0 until 20).map(i => s"qx${i}vt").mkString(" ")
    assert(math.abs(cos(embed(base), embed(other))) < 0.35)
    // degenerate text embeds as the exact zero vector
    assert(embed("!!!").forall(_ == 0.0f))
    assert(embed("").forall(_ == 0.0f))
  }

  test("hashedNgramEmbedding rejects a non-string child at analysis time") {
    // TextEmbed.checkInputDataTypes: an int column must fail as a
    // clean AnalysisException, not a codegen ClassCastException
    // (embedText itself always canonicalizes through array_join, so
    // the raw expression entry point is where the type check bites)
    val df = Seq((1, 10), (2, 20)).toDF("id", "n")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.plans.HashExpressions
        .hashedNgramEmbedding(col("n"), dim = 16)).collect()
    }
    assert(ex.getMessage.contains("string"))
  }

  test("embedText composes with semDeDup: planted copies drop, originals keep") {
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 25).map(j => s"t${i}w$j").mkString(" "))
    }
    val copies = Seq(7L, 21L).map(i => (1000L + i, docs(i.toInt)._2))
    val df = (docs ++ copies).toDF("doc_id", "text")
      .select(col("doc_id"),
        TF.embedText(col("text"), dim = 128).as("emb"))
    val got = graft.operators.Similarity.semDeDup(
      df, "emb", "doc_id", nClusters = 4, dim = 128, eps = 0.01)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.size == 42)
    assert(!got(1007L) && !got(1021L)) // exact-copy texts drop
    docs.map(_._1).foreach(id => assert(got(id), s"original $id"))
  }

  test("extractMainContent keeps body prose, kills nav/footer/aside/stubs") {
    val page =
      "<html><head><title>T</title><script>var n = '<div>trap</div>';</script>" +
        "<style>p { color: red }</style></head><body>" +
        "<nav><a href=\"/\">Homepage and Welcome</a> " +
        "<a href=\"/about\">About the Project Team</a></nav>" +
        "<h1>Short heading</h1>" +
        "<div>This paragraph carries the actual long-form body prose of " +
        "the page, with no anchors at all inside it.</div>" +
        "<p>An article block that mentions <a href=\"/ref\">one source</a> " +
        "among plenty of surrounding prose survives the density rule.</p>" +
        "<p>Tiny.</p>" +
        "<aside><a href=\"/ads\">Sponsored offers and deals</a> click</aside>" +
        "<footer><a href=\"/p\">Privacy Policy</a> <a href=\"/t\">Terms of " +
        "Service</a> (c) Corp</footer></body></html>"
    val got = one(TF.extractMainContent(col("t")), page).asInstanceOf[String]
    val lines = got.split("\n").toSeq
    assert(lines.size == 2, s"got $lines")
    assert(lines(0).startsWith("This paragraph carries"))
    assert(lines(1).contains("one source among plenty"))
    assert(!got.contains("Homepage") && !got.contains("Privacy") &&
      !got.contains("Sponsored") && !got.contains("Tiny") &&
      !got.contains("Short heading") && !got.contains("trap"))
    // thresholds are caller-tunable: a permissive link cap keeps the nav
    val loose = one(TF.extractMainContent(col("t"), minChars = 10,
      maxLinkPct = 100), page).asInstanceOf[String]
    assert(loose.contains("Homepage and Welcome"))
    // degenerate inputs: no blocks -> empty string, never an error
    assert(one(TF.extractMainContent(col("t")), "").asInstanceOf[String] == "")
    assert(one(TF.extractMainContent(col("t")), "plain text with no tags " +
      "but enough characters to clear the floor").asInstanceOf[String]
      .startsWith("plain text"))
    // UNCLOSED anchor (card/nav markup where <a> wraps block children):
    // the anchor text shares its block with the open tag, the </a>
    // lands past the <br> boundary — the whole tail counts as linky
    val card =
      "<body><div>Real long-form body prose of the page stays in " +
        "place as always here.</div>" +
        "<aside><a href=\"/deals\">Todays greatest discount offers and " +
        "clearance bargains<br></a></aside></body>"
    val cardGot = one(TF.extractMainContent(col("t")), card).asInstanceOf[String]
    assert(cardGot.startsWith("Real long-form body prose"), s"got $cardGot")
    assert(!cardGot.contains("discount"), s"unclosed-anchor card kept: $cardGot")
    // ...but prose FOLLOWING a properly closed anchor still counts as
    // prose (the closed-pair rule, unchanged)
    val closed =
      "<body><div>Intro prose sentence <a href=\"/x\">tiny link</a> and " +
        "then a long run of genuine article prose continuing on well " +
        "past the link text itself.</div></body>"
    assert(one(TF.extractMainContent(col("t")), closed).asInstanceOf[String]
      .contains("genuine article prose"))
  }

  test("stripHtml drops script/style/comments, spaces tags, decodes entities once") {
    def strip(s: String): String =
      one(TF.stripHtml(col("t")), s).asInstanceOf[String]
    assert(strip("<html><body><h1>Title</h1><p>a b</p></body></html>") == "Title a b")
    // tags are word boundaries, not fused away
    assert(strip("a</p><p>b") == "a b")
    // script/style contents vanish entirely, even with < inside
    assert(strip("<script>var x = 1 < 2;</script>keep<style>p{}</style>") == "keep")
    assert(strip("x<!-- hidden -->y") == "x y")
    // entity decode is single-pass: &amp;lt; -> &lt; (literal), not <
    assert(strip("it&#39;s &quot;q&quot; 1 &lt; 2 &amp; more") == "it's \"q\" 1 < 2 & more")
    assert(strip("a&amp;lt;b") == "a&lt;b")
    assert(strip("a&nbsp;b") == "a b")
    // malformed nesting degrades to literal text, never errors
    assert(strip("<p <broken>text") == "text")
    assert(strip("") == "")
  }
}
