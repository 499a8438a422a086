package graft

import graft.functions.LangId

class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private val samples = Seq(
    (1L, "en", "The quick brown fox is jumping over the lazy dog and the cat was watching"),
    (2L, "en", "This is the story of the engineering of a database and the things we learned"),
    (3L, "de", "Der Hund und die Katze sind ein gutes Beispiel und das ist schön"),
    (4L, "de", "Ich möchte das Buch lesen und die Geschichte ist wirklich gut"),
    (5L, "es", "El perro y la casa que tiene una puerta es de la ciudad"),
    (6L, "es", "La construcción de la nación es una cuestión de organización"),
    (7L, "fr", "Le chien et le chat sont dans les maisons de la ville"),
    (8L, "fr", "Les ingénieurs construisent une solution élégante et le moteur était rapide"),
    (9L, "und", "zzz qqq xxx"))

  test("trigram profiles classify real sentences per language") {
    val docs = samples.map(s => (s._1, s._3)).toDF("doc_id", "text")
    val pred = LangId.predict(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, expected, _) <- samples)
      assert(pred(id) == expected, s"doc $id: got ${pred(id)}, want $expected")
  }

  test("trigrams expression: one-pass extraction matches substring semantics") {
    graft.functions.Trigrams.register(spark)
    import org.apache.spark.sql.functions._
    val out = Seq("abcde").toDF("t")
      .select(call_function("trigrams", col("t")).as("r"))
      .collect()(0).getSeq[String](0).toList
    assert(out == List("abc", "bcd", "cde"))
    val short = Seq("ab").toDF("t")
      .select(call_function("trigrams", col("t")).as("r"))
      .collect()(0).getSeq[String](0).toList
    assert(short == Nil)
    // multi-byte safety: code points, not bytes
    val uni = Seq("héllo").toDF("t")
      .select(call_function("trigrams", col("t")).as("r"))
      .collect()(0).getSeq[String](0).toList
    assert(uni == List("hél", "éll", "llo"))
  }

  test("no-trigram text yields ('und', 0)") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val row = LangId.predict(docs, "doc_id", "text").collect()(0)
    assert(row.getString(1) == "und" && row.getLong(2) == 0L)
  }

  test("lang_scores kernel equals the exploded profile-join sums " +
      "(multi-byte, >7-byte windows, empty)") {
    import org.apache.spark.sql.functions._
    // tricky rows: 2-byte profile chars (ó/é), 4-byte chars that make
    // >7-byte windows (must match nothing, not crash), short/empty
    val tricky = Seq((100L, "x", "ción ión ció the and of"),
      (101L, "x", "𝔘𝔫𝔦 𝔠𝔬𝔡𝔢 the and of the"),
      (102L, "x", ""), (103L, "x", "ab"))
    val docs = (samples.map(s => (s._1, s._2, s._3)) ++ tricky)
      .toDF("doc_id", "lang", "text")
    // reference: the pre-r20 exploded broadcast-join aggregation
    val ref = LangId.scores(docs.select(col("doc_id"), lower(col("text")).as("t")),
        "doc_id", "t")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    graft.functions.LangScores.register(spark)
    val got = docs.select(col("doc_id"),
        call_function("lang_scores", lower(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- got.keys; (l, i) <- LangId.langOrder.zipWithIndex)
      assert(got(id)(i) == ref.getOrElse((id, l), 0L),
        s"doc $id lang $l: kernel ${got(id)(i)} vs join ${ref.getOrElse((id, l), 0L)}")
  }

  test("deterministic tie-break follows langOrder priority") {
    // 'de ' scores for es(de:4) and fr(de:3); ' de' for en? craft a
    // string hitting en and de equally is fragile — instead assert
    // stability: same input twice, same output.
    val docs = Seq((1L, "de de de")).toDF("doc_id", "text")
    val a = LangId.predict(docs, "doc_id", "text").collect()(0)
    val b = LangId.predict(docs, "doc_id", "text").collect()(0)
    assert(a.getString(1) == b.getString(1) && a.getLong(2) == b.getLong(2))
  }
}
