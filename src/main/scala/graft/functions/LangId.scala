package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-trigram language identification (SURVEY.md §2.11 "text
  * analysis: language-ID (n-gram heuristic)") — the classic profile
  * method: embedded per-language trigram weight profiles (function
  * words and characteristic letter sequences), score = Σ weight of
  * the text's trigrams per language, argmax with a fixed tie order.
  *
  * Pipeline shape (r20): lowercase → the one-pass native
  * [[LangScores]] kernel (per-language sums as one `array<long>`
  * projection — no explode, no join, ZERO shuffles) → argmax/
  * tie-break as a fixed expression tree. Profiles are integer
  * weights so scores are exact and the whole operator is
  * DuckDB-expressible (the oracle SQL embeds the same profile as a
  * VALUES list — see [[graft.queries.TextQueries]]). The exploded
  * broadcast-join form survives as [[scores]] for per-(doc, lang)
  * consumers.
  */
object LangId {

  /** (lang, trigram, weight). Hand-built from high-frequency function
    * words; space-padded trigrams anchor word boundaries. */
  val profiles: Seq[(String, String, Int)] = {
    def p(lang: String, entries: (String, Int)*): Seq[(String, String, Int)] =
      entries.map { case (t, w) => (lang, t, w) }
    p("en", (" th", 5), ("the", 5), ("he ", 4), (" an", 3), ("and", 4),
      ("nd ", 3), (" of", 4), ("of ", 4), ("ing", 4), ("ng ", 3),
      (" to", 3), ("to ", 3), (" is", 3), ("is ", 3), ("ed ", 2),
      (" wa", 2), ("was", 3), ("ion", 2)) ++
    p("de", ("der", 5), (" de", 4), ("die", 5), (" di", 4), ("und", 5),
      (" un", 4), ("nd ", 3), ("ein", 4), ("ich", 4), ("sch", 4),
      ("ch ", 3), ("cht", 3), ("en ", 3), ("ist", 3), (" is", 1),
      ("das", 4), (" da", 2)) ++
    p("es", (" de", 4), ("de ", 4), (" la", 4), ("la ", 4), (" el", 4),
      ("el ", 3), ("que", 4), (" qu", 3), ("ue ", 3), ("ión", 4),
      ("ció", 4), ("os ", 3), ("as ", 3), ("ar ", 2), (" es", 3),
      ("es ", 3), ("una", 3)) ++
    p("fr", (" le", 4), ("le ", 4), (" la", 3), ("es ", 3), (" de", 4),
      ("de ", 3), ("ent", 4), ("nt ", 3), (" et", 4), ("et ", 3),
      ("ait", 3), ("eur", 3), ("que", 3), ("une", 3), (" un", 2),
      ("les", 4), ("ais", 3)) ++
    p("zh", ("zh ", 4), ("sh ", 3), ("shi", 4), (" zh", 4), ("de ", 2),
      ("ang", 3), ("eng", 3), ("ian", 3), ("ing", 1), ("ong", 3),
      ("uan", 3), (" xi", 3), (" qi", 3), ("ao ", 3))
  }

  /** Fixed tie priority (first wins on equal score). */
  val langOrder: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  /** Exploded (doc_id, lang, w) profile matches — the shared front of
    * [[scores]] and [[predict]]: lowercase → native trigram explode →
    * broadcast join against the profile relation. */
  private def profileMatches(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prof = broadcast(profiles.toDF("lang", "tri", "w"))
    Trigrams.register(spark)
    docs.select(col(idCol).as("doc_id"),
        explode(call_function("trigrams", lower(col(textCol)))).as("tri"))
      .join(prof, "tri")
  }

  /** Per-(doc, lang) trigram-profile scores. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    profileMatches(docs, idCol, textCol)
      .groupBy("doc_id", "lang")
      .agg(sum(col("w")).as("score"))

  /** Argmax over the per-language scores with the fixed tie order;
    * docs with no scoring trigram at all come out as ('und', 0).
    *
    * r20 (guide §2.4): fully map-side — the per-language sums come
    * from the one-pass native [[LangScores]] kernel (one projection,
    * ZERO shuffles), replacing the explode → broadcast-profile-join →
    * groupBy(doc_id) front whose exchange carried every matched
    * trigram occurrence; `carry` columns simply stay on the row, so
    * the id-set join is gone too. Identical results: the kernel's
    * sums equal the join form's per-language aggregates (a language
    * with no match reads 0 where the join produced NULL — both lose
    * the argmax to any real score ≥ 1, and an all-zero row is exactly
    * the old no-rows case, mapped to ('und', 0) by the score = 0
    * test; the oracle SQL keeps the exploded ROW_NUMBER formulation
    * and hash-matches — measured q_lang_trigram 1.88 s → 0.41 s at
    * sf0.1). */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val spark = docs.sparkSession
    // `_s` is referenced once per language below — the multi-reference
    // keeps CollapseProject from inlining the kernel per element_at
    // (the WordShingles lesson: single-consumer aliases get inlined).
    val base = docs.select(col(idCol).as("doc_id") +: carry.map(col) :+
      LangScores.langScores(spark, lower(col(textCol))).as("_s"): _*)
    val sL = langOrder.indices.map(i => element_at(col("_s"), i + 1))
    val score = coalesce(greatest(sL: _*), lit(0L))
    base
      .withColumn("score", score)
      .withColumn("pred_lang",
        when(col("score") === 0L, lit("und")).otherwise(
          langOrder.zip(sL).foldRight(lit("und")) { case ((l, s), acc) =>
            when(s === col("score"), lit(l)).otherwise(acc)
          }))
      .select(Seq(col("doc_id")) ++ carry.map(col) ++ Seq(
        col("pred_lang"), col("score")): _*)
  }
}
