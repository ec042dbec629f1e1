package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** Round-17 funnel kernel swap pinned to the pre-swap HOF formulation:
  * [[graft.functions.FunnelStats]] / [[graft.functions.FunnelKeep]] vs
  * the verbatim relational qualityFunnel/repetitionStats pipelines —
  * same per-rule booleans, same signal values (bit-exact doubles), same
  * language guesses, same keep decisions (incl. the null-text
  * null-or-false → false filter equivalence).
  */
class FunnelKernelSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- the pre-round-17 formulation, verbatim (the reference) ----
  private def let(value: Column)(body: Column => Column): Column =
    get(transform(array(value), v => body(v)), lit(0))

  private def refRepStruct(textCol: Column): Column = {
    val t = trim(textCol)
    let(filter(split(t, "\n"), l => length(trim(l)) > 0)) { lines =>
      let(filter(split(t, "\\s+"), w => length(w) > 0)) { words =>
        val nl = size(lines)
        val nw = size(words)
        val lineChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
        val distLineChars = aggregate(array_distinct(lines), lit(0L),
          (acc, l) => acc + length(l))
        val wordChars = aggregate(words, lit(0L), (acc, w) => acc + length(w))
        val dupLineFrac = when(nl > 0,
          (nl - size(array_distinct(lines))).cast("double") / nl)
          .otherwise(0.0)
        val dupLineCharFrac = when(lineChars > 0,
          (lineChars - distLineChars).cast("double") / lineChars)
          .otherwise(0.0)
        def grams(n: Int): Column =
          when(nw >= n, transform(sequence(lit(1), nw - (n - 1)),
            i => array_join(slice(words, i, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))
        val top2 = let(grams(2)) { g2 =>
          let(array_max(transform(array_distinct(g2), g => struct(
            size(filter(g2, x => x === g)).as("c"),
            (length(g) - 1).as("l"), g.as("g"))))) { best =>
            when(size(g2) > 0 && wordChars > 0,
              (best.getField("c") * best.getField("l")).cast("double") /
                wordChars).otherwise(0.0)
          }
        }
        val dup5 = let(grams(5)) { g5 =>
          let(aggregate(array_distinct(g5), lit(0L), (acc, g) =>
            acc + let(size(filter(g5, x => x === g))) { c =>
              when(c > 1, c.cast("long") * (length(g) - 4)).otherwise(0L)
            })) { dupChars =>
            when(wordChars > 0,
              least(lit(1.0), dupChars.cast("double") / wordChars))
              .otherwise(0.0)
          }
        }
        struct(nl.as("n_lines"), nw.as("n_words"),
          dupLineFrac.as("dup_line_frac"),
          dupLineCharFrac.as("dup_line_char_frac"),
          top2.as("top_2gram_char_frac"),
          dup5.as("dup_5gram_char_frac"))
      }
    }
  }

  private val lexicons = graft.functions.FunnelStatsImpl.LangLexicons

  private def refLangId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = lexicons.map { case (lang, lex) =>
      val lexArr = array(lex.map(lit): _*)
      struct(size(filter(toks, t => array_contains(lexArr, t))).as("score"),
        lit(lang).as("lang"))
    }
    val best = scored.reduce((x, y) =>
      when(y.getField("score") > x.getField("score"), y).otherwise(x))
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  private val stops = Seq("the", "a", "of", "and", "to", "in")

  private def refFunnel(docs: DataFrame, langs: Seq[String],
                        minTokens: Long, maxTokens: Long,
                        maxStop10k: Long, minAvgLen10: Long,
                        maxAvgLen10: Long): DataFrame = {
    val stopArr = array(stops.map(lit): _*)
    def fToks(text: Column) = filter(tokens(text), t => length(t) > 0)
    docs.select(col("doc_id"),
        size(fToks(col("text"))).cast("long").as("n_tokens"),
        size(filter(fToks(col("text")), t => array_contains(stopArr, t)))
          .cast("long").as("__nstop"),
        aggregate(fToks(col("text")), lit(0L), (acc, t) => acc + length(t))
          .as("__wc"),
        refRepStruct(col("text")).as("__r"),
        refLangId(col("text")).as("lang_guess"))
      .withColumn("r_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("r_avg_len",
        col("__wc") * 10L >= col("n_tokens") * minAvgLen10 &&
          col("__wc") * 10L <= col("n_tokens") * maxAvgLen10)
      .withColumn("r_stop",
        col("__nstop") * 10000L <= col("n_tokens") * maxStop10k)
      .withColumn("r_rep",
        col("__r.dup_line_frac") <= 0.30 &&
          col("__r.dup_line_char_frac") <= 0.20 &&
          col("__r.top_2gram_char_frac") <= 0.20 &&
          col("__r.dup_5gram_char_frac") <= 0.15)
      .withColumn("r_lang", col("lang_guess").isInCollection(langs))
      .withColumn("keep", col("r_len") && col("r_avg_len") &&
        col("r_stop") && col("r_rep") && col("r_lang"))
  }

  private val docs = Seq[(Long, String)](
    (1L, "the quick brown fox jumps over the lazy dog and the cat in the hat"),
    (2L, "l1\nl1\nl1\nl2 words words words words repeated here"),
    (3L, ""),
    (4L, null),
    (5L, "   "),
    (6L, "der die das und ist ein nicht mit etwas mehr deutscher text hier"),
    (7L, "uni😀code sur😀rogate pairs 😀😀 count as one char each time"),
    (8L, "a b a b a b a b a b a b a b a b a b a b"),
    (9L, "one two three four five one two three four five one two three " +
      "four five six seven"),
    (10L, "\ttabbed\nlines\twith\ttabs\nlines\twith\ttabs\n  \n"),
    (11L, "el la los las es una que por texto español aquí presente"),
    (12L, ("unique" + " tok") * 3 + " the of and to in the of and to in"),
    (13L, "x y x y zz x y zz ww x y"),
    (14L, "single")
  )

  test("funnelStats kernel ≡ HOF repetition struct + langId (bit-exact)") {
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.functions.FunnelOps.funnelStats(col("text"), stops).as("s"))
      .select(col("doc_id"), col("s.n_lines"), col("s.n_words"),
        col("s.dup_line_frac"), col("s.dup_line_char_frac"),
        col("s.top_2gram_char_frac"), col("s.dup_5gram_char_frac"),
        col("s.lang_guess"), col("s.n_tokens"), col("s.n_stop"),
        col("s.word_chars"))
      .orderBy("doc_id").collect()
    val stopArr = array(stops.map(lit): _*)
    def fToks(text: Column) = filter(tokens(text), t => length(t) > 0)
    val want = df.select(col("doc_id"), refRepStruct(col("text")).as("r"),
        refLangId(col("text")).as("lg"),
        size(fToks(col("text"))).cast("long").as("nt"),
        size(filter(fToks(col("text")), t => array_contains(stopArr, t)))
          .cast("long").as("ns"),
        aggregate(fToks(col("text")), lit(0L), (acc, t) => acc + length(t))
          .as("wc"))
      .select(col("doc_id"), col("r.n_lines"), col("r.n_words"),
        col("r.dup_line_frac"), col("r.dup_line_char_frac"),
        col("r.top_2gram_char_frac"), col("r.dup_5gram_char_frac"),
        col("lg"), col("nt"), col("ns"), col("wc"))
      .orderBy("doc_id").collect()
    got.zip(want).foreach { case (g, w) =>
      (0 until 11).foreach { f =>
        assert(g.isNullAt(f) == w.isNullAt(f),
          s"nullity doc=${g.getLong(0)} field $f: got ${g.get(f)} want ${w.get(f)}")
        if (!g.isNullAt(f))
          assert(g.get(f) == w.get(f),
            s"doc=${g.getLong(0)} field $f: got ${g.get(f)} want ${w.get(f)}")
      }
    }
  }

  test("qualityFunnel over the kernel ≡ verbatim relational funnel") {
    val df = docs.toDF("doc_id", "text")
    for ((langs, minT, maxT, stop10k, minA, maxA) <- Seq(
        (Seq("en"), 5L, 100000L, 5000L, 30L, 100L),
        (Seq("en", "de", "es"), 1L, 20L, 1500L, 10L, 80L))) {
      val got = graft.operators.TextAnalysis.qualityFunnel(df, "doc_id",
        "text", langs, minT, maxT, stop10k, minA, maxA, stops)
        .orderBy("doc_id").collect()
      val want = refFunnel(df, langs, minT, maxT, stop10k, minA, maxA)
        .select("doc_id", "n_tokens", "lang_guess", "r_len", "r_avg_len",
          "r_stop", "r_rep", "r_lang", "keep")
        .orderBy("doc_id").collect()
      got.zip(want).foreach { case (g, w) =>
        (0 until 9).foreach { f =>
          assert(g.isNullAt(f) == w.isNullAt(f) &&
            (g.isNullAt(f) || g.get(f) == w.get(f)),
            s"langs=$langs doc=${g.getLong(0)} field $f: " +
              s"got ${g.get(f)} want ${w.get(f)}")
        }
      }
    }
  }

  test("qualityKeep kernel: kept row set ≡ relational predicate filter") {
    val df = docs.toDF("doc_id", "text")
    val kept = df.filter(graft.operators.TextAnalysis.qualityKeep(
        col("text"), Seq("en", "de"), 2L, 100L, 5000L, 10L, 100L, stops))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val want = refFunnel(df, Seq("en", "de"), 2L, 100L, 5000L, 10L, 100L)
      .filter(col("keep"))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == want)
  }
}
