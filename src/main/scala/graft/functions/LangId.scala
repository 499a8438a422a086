package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-trigram language identification (SURVEY.md §2.11 "text
  * analysis: language-ID (n-gram heuristic)") — the classic profile
  * method: embedded per-language trigram weight profiles (function
  * words and characteristic letter sequences), score = Σ weight of
  * the text's trigrams per language, argmax with a fixed tie order.
  *
  * Pipeline shape: lowercase → trigram explode (plain substring, no
  * regex) → broadcast join against the ~90-row profile relation →
  * one conditional aggregate per language in a single
  * groupBy(doc_id) → argmax/tie-break as a fixed expression tree.
  * One small broadcast, ONE shuffle. Profiles are integer weights so scores are
  * exact and the whole operator is DuckDB-expressible (the oracle SQL
  * embeds the same profile as a VALUES list — see
  * [[graft.queries.TextQueries]]).
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
    * docs with no scoring trigram at all fall out as ('und', 0) via
    * the left join back onto the id set.
    *
    * The language domain is small and fixed, so instead of
    * per-(doc, lang) rows + a row_number window (a second shuffle and
    * sort of every scored row), ONE conditional aggregation per
    * language computes all scores in a single groupBy(doc_id) — the
    * argmax and tie-break become a fixed `greatest`/`when` expression
    * tree. Identical results to the windowed form (the oracle SQL
    * keeps the ROW_NUMBER formulation and hash-matches). */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val perLang = langOrder.map(l =>
      sum(when(col("lang") === l, col("w"))).as(s"s_$l"))
    val wide = profileMatches(docs, idCol, textCol)
      .groupBy("doc_id")
      .agg(perLang.head, perLang.tail: _*)
    val best = wide.withColumn("score",
        greatest(langOrder.map(l => col(s"s_$l")): _*))
      .withColumn("pred_lang",
        langOrder.foldRight(lit("und")) { case (l, acc) =>
          when(col(s"s_$l") === col("score"), lit(l)).otherwise(acc)
        })
      .select(col("doc_id"), col("pred_lang"), col("score"))
    // `carry` threads constant-per-doc columns (e.g. the label) through
    // the id-set join so a confusion-rollup consumer needs no SECOND
    // corpus scan + doc_id join to re-attach them (r19; guide §2.4).
    docs.select(col(idCol).as("doc_id") +: carry.map(col): _*)
      .join(best, Seq("doc_id"), "left")
      .select(Seq(col("doc_id")) ++ carry.map(col) ++ Seq(
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score")): _*)
  }
}
