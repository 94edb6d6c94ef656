package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ByteBpe
import org.apache.spark.sql.functions._

class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("byte→unicode table is the published 256-way bijection") {
    assert(ByteBpe.byteChar.length == 256)
    assert(ByteBpe.byteChar.distinct.length == 256)
    // printable bytes map to themselves
    assert(ByteBpe.byteChar('A'.toInt) == "A")
    assert(ByteBpe.byteChar(33) == "!")
    assert(ByteBpe.byteChar(126) == "~")
    assert(ByteBpe.byteChar(0xc3) == "Ã")
    // the famous remaps: non-printables take 256+n in byte order
    assert(ByteBpe.byteChar(32) == "Ġ") // space → Ġ
    assert(ByteBpe.byteChar(10) == "Ċ") // \n → Ċ
    assert(ByteBpe.byteChar(9) == "ĉ") // \t → ĉ
    // the alphabet has no whitespace/control chars — symbols survive
    // any text serialization
    ByteBpe.byteChar.foreach { s =>
      val cp = s.codePointAt(0)
      assert(!Character.isWhitespace(cp) && !Character.isISOControl(cp), s)
    }
    (0 until 256).foreach(b =>
      assert(ByteBpe.charByte(ByteBpe.byteChar(b).codePointAt(0)) == b))
  }

  private def pre(s: String): Seq[String] =
    Seq(s).toDF("t").select(ByteBpe.pretokens(col("t")).as("p"))
      .as[Seq[String]].head()

  test("pretokenizer: the published GPT-2 splits") {
    assert(pre("Hello world!") == Seq("Hello", " world", "!"))
    assert(pre("don't stop") == Seq("don", "'t", " stop"))
    assert(pre("abc123 45") == Seq("abc", "123", " 45"))
    // trailing-whitespace lookahead: the space before a following token
    // stays attached to THAT token; a final whitespace run stands alone
    assert(pre("a  b") == Seq("a", " ", " b"))
    assert(pre("trailing  ") == Seq("trailing", "  "))
    // every char class tiles: letters/digits/punct/whitespace cover all
    assert(pre("é日本 x1?") == Seq("é日本", " x", "1", "?"))
  }

  test("toByteSymbols: multi-byte chars split into per-byte symbols") {
    assert(ByteBpe.toByteSymbols("aé") == Seq("a", "Ã", "©"))
    assert(ByteBpe.toByteSymbols(" b") == Seq("Ġ", "b"))
    assert(ByteBpe.toByteSymbols("x").length == 1)
    assert(ByteBpe.toByteSymbols("🙂").length == 4) // 4-byte UTF-8
  }

  test("decode ∘ encode is the identity on arbitrary Unicode (no unk exists)") {
    val tricky = Seq("Hello, world!", "naïve — résumé", "日本語テキスト",
      "🙂🚀 emoji", "mixed 🙂 ASCII\tand\nnewlines", "")
    val df = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val enc = ByteBpe.encodeCorpus(df, "id", "text", merges = Seq.empty)
      .orderBy("id").as[(Long, Seq[String], Long)].collect()
    tricky.zipWithIndex.foreach { case (t, i) =>
      assert(ByteBpe.decode(enc(i)._2) == t, s"round-trip failed for '$t'")
    }
  }

  test("training hand trace: merge inside é, then the Ġ space merge") {
    // the byte-vs-char separating fixture: é is TWO base symbols (Ã ©)
    // here, one atomic symbol at char level — round 1's merge cannot
    // exist for a char-level trainer; round 4 forms a Ġ-prefixed token
    val docs = Seq.fill(3)("aé bé").toDF("text")
    val got = ByteBpe.train(docs, "text", rounds = 10)
      .orderBy("round").as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "Ã", "©", 6L),
      (2L, "a", "Ã©", 3L),
      (3L, "b", "Ã©", 3L),
      (4L, "Ġ", "bÃ©", 3L)), got.toString)
  }

  test("merges never cross pretoken boundaries") {
    // "xy xy" → pretokens "xy" and " xy": a boundary-crossing (y, Ġ)
    // pair would count 4; the learned table must be exactly the
    // within-pretoken pair then the Ġ-prefixed word
    val docs = Seq.fill(4)("xy xy").toDF("text")
    val got = ByteBpe.train(docs, "text", rounds = 10)
      .orderBy("round").as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "x", "y", 8L),
      (2L, "Ġ", "xy", 4L)), got.toString)
  }

  test("encodeCorpus: doc order, case preserved, empty docs kept") {
    val merges = Seq(("Ã", "©"), ("a", "Ã©"))
    val df = Seq((1L, "aé Bé"), (2L, "")).toDF("id", "text")
    val got = ByteBpe.encodeCorpus(df, "id", "text", merges)
      .orderBy("id").as[(Long, Seq[String], Long)].collect()
    // " Bé" seeds [Ġ B Ã ©] → (Ã,©) applies, (a,Ã©) does not; B stays
    // uppercase (byte-level tokenizers never lowercase)
    assert(got(0)._2 == Seq("aÃ©", "Ġ", "B", "Ã©"), got(0)._2.toString)
    assert(got(0)._3 == 4L)
    assert(got(1)._2.isEmpty && got(1)._3 == 0L)
  }

  test("train → encode → decode closes the loop losslessly") {
    val corpus = Seq.fill(5)("the cat, thé 🙂").toDF("text")
    val merges = ByteBpe.train(corpus, "text", rounds = 8)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    // the input contains a LITERAL Ġ character: its UTF-8 bytes map to
    // other symbols, so it can never collide with the Ġ space marker —
    // the bijection property that makes byte-level decoding total
    val text = "the cat, thé 🙂 & Ġmás"
    val doc = Seq((1L, text)).toDF("id", "text")
    val enc = ByteBpe.encodeCorpus(doc, "id", "text", merges)
      .as[(Long, Seq[String], Long)].head()
    assert(ByteBpe.decode(enc._2) == text)
    assert(enc._3 < text.getBytes("UTF-8").length, "merges must compress")
  }

  test("rounds guard refuses loudly") {
    val e = intercept[IllegalArgumentException](
      ByteBpe.train(Seq("x").toDF("text"), "text", 0))
    assert(e.getMessage.contains("rounds"), e.getMessage)
  }

  test("special tokens: atomic, decode-transparent, longest-first") {
    // OVERLAPPING specials: <|end|> is a PREFIX-SHARING sibling of
    // <|endoftext|> — the single-alternation fence must pick the longer
    // literal at the same position (a per-special sequential replace
    // could corrupt the longer's fence)
    val specials = Seq("<|end|>", "<|endoftext|>")
    val text = "ab<|endoftext|>cd<|end|>ef <|en gh"
    val doc = Seq((1L, text)).toDF("id", "text")
    val enc = ByteBpe.encodeCorpus(doc, "id", "text",
        merges = Seq(("a", "b")), specials = specials)
      .as[(Long, Seq[String], Long)].head()
    // the merge fires on ab; both specials are single atomic tokens;
    // the partial "<|en" is ordinary text
    assert(enc._2.contains("<|endoftext|>") && enc._2.contains("<|end|>"),
      enc._2.toString)
    assert(enc._2.count(_ == "<|endoftext|>") == 1, enc._2.toString)
    assert(enc._2.head == "ab", enc._2.toString)
    // ASCII specials decode transparently (printable-identity byte rows)
    assert(ByteBpe.decode(enc._2) == text)
    val e = intercept[IllegalArgumentException](
      ByteBpe.encodeCorpus(doc, "id", "text", Nil, specials = Seq("")))
    assert(e.getMessage.contains("special"), e.getMessage)
  }
}
