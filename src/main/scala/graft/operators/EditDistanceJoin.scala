package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (string near-dup detection), the
  * q-gram prefix-filter algorithm (the published Ed-Join technique — Xiao,
  * Wang & Lin, VLDB 2008): a lossless candidate generator plus an exact
  * verify, never the O(n²) cross join.
  *
  * Candidate generation, per string `s` with positional q-grams G(s):
  *   1. multiset → set: the i-th occurrence of gram g becomes token (g, i),
  *      so multiset overlap equals set overlap exactly;
  *   2. k edits destroy ≤ q·k tokens, so ed(s,t) ≤ k ⇒ |G(s) ∩ G(t)| ≥
  *      |G(s)| − q·k — the classic count filter;
  *   3. prefix filter: order every token set by one global canonical order
  *      (ascending document frequency — rarest grams first — then gram,
  *      then occurrence) and keep the first q·k + 1 tokens; any pair within
  *      distance k must collide on at least one prefix token.
  *   4. The prefix theorem needs the LARGER string of a pair to own at
  *      least q·k + 1 grams (overlap bound α = max(|G_A|,|G_B|) − q·k ≥ 1);
  *      a pair where both strings have len ≤ q·(k+1) − 1 can evade it. So
  *      the two candidate paths OVERLAP rather than partition: every string
  *      with at least one gram (len ≥ q) runs the prefix filter (a string
  *      with |G| < q·k + 1 simply indexes all its grams — still sound when
  *      its partner is longer), and the bucket {len ≤ q·(k+1) − 1} is
  *      additionally all-pairs'd within the ±k length band — bounded by
  *      |Σ|^(q·(k+1)−1) distinct values, a constant. Strings shorter than q
  *      (no grams at all) can only pair inside that bucket: their shortest
  *      prefix-path partner has len ≥ q·(k+1) − k = q·k + q − k > (q−1) + k,
  *      outside the length band.
  *
  * Verify: `levenshtein(a, b, k)` — Spark's thresholded Levenshtein bails
  * out of the DP early once the band exceeds k, so verification is
  * O(k·min(|a|,|b|)) per candidate, not O(|a|·|b|).
  *
  * 100 TB shape: grams/tokens are map-side higher-order functions inside
  * whole-stage codegen (no UDFs); the only shuffles are the token-frequency
  * count, the per-string prefix top-(qk+1), and the equi-join on prefix
  * tokens. Rarest-first prefix ordering keeps candidate buckets small by
  * construction — the hot-gram flood that breaks naive gram joins lands in
  * the frequent grams, which the prefix skips. Self-join output is halved
  * by the a_id < b_id guard before the verify. The candidate join and the
  * distinct carry ONLY (id, length) — for long strings (documents) the
  * payload would dominate the exchange, so strings re-join by id after
  * the candidate set is deduped, and the length band prunes with the
  * carried lengths before any string moves.
  *
  * CACHE LIFECYCLE (round 14, ADVICE): [[selfJoin]] caches the collapsed
  * gram counts and the prefix frame for the duration of the returned
  * LAZY plan (the consuming action lives in the caller, so the operator
  * cannot unpersist them itself). Long-lived sessions must release them
  * via `spark.catalog.clearCache()` / `graft.Caches.reset` between
  * invocations — the bench/verify harness already does.
  */
object EditDistanceJoin {

  /** Hashed positional q-grams, one compiled allocation-free pass per
    * string (round 14): the previous `transform(sequence(…), i ->
    * xxhash64(substring(…)))` ran Catalyst's INTERPRETED lambda
    * evaluator per gram — measured as j18's dominant stage CPU (a ~1 KB
    * doc yields ~1k grams, each paying a substring allocation plus an
    * interpreted xxhash64 call). The gram hash is purely an INTERNAL
    * identity/order key (count filter, freq order, prefix rank, candidate
    * equi-join); the verify is the exact thresholded levenshtein on the
    * original strings — so ANY 64-bit hash yields the same final pairs
    * (the prefix theorem holds for every shared total order, and a
    * collision only merges gram identities). FNV-1a over the q UTF-16
    * units: zero allocations per gram. */
  private def gramHashesUdf(q: Int) = udf { (s: String) =>
    if (s == null) null
    else if (s.length < q) Array.empty[Long]
    else {
      val out = new Array[Long](s.length - q + 1)
      var i = 0
      while (i < out.length) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + q) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
        out(i) = h
        i += 1
      }
      out
    }
  }

  /** Hashed ≤k-deletion neighbourhood, compiled and deduped in one pass
    * (round 14): replaces k nested interpreted
    * `array_distinct(flatten(transform(…)))` layers plus a per-variant
    * substring-concat — the variant hash, like the gram hash above, is
    * only an equi-join key (the verify is exact), so hashing the variant
    * CHARACTERS directly (FNV-1a, skipping the deleted positions) is
    * output-identical and never materializes a variant string. */
  private def deletionHashesUdf(k: Int) = udf { (s: String) =>
    if (s == null) null
    else {
      val n = s.length
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new scala.collection.mutable.ArrayBuffer[Long]()
      def hashSkipping(skip: Array[Int], nSkip: Int): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0
        var si = 0
        while (i < n) {
          // skip positions are strictly ascending by construction
          if (si < nSkip && skip(si) == i) si += 1
          else { h ^= s.charAt(i); h *= 0x100000001b3L }
          i += 1
        }
        h
      }
      val skip = new Array[Int](math.max(k, 1))
      def emit(h: Long): Unit = if (seen.add(h)) out += h
      emit(hashSkipping(skip, 0))
      def rec(depth: Int, from: Int): Unit =
        if (depth < k) {
          var p = from
          while (p < n) {
            skip(depth) = p
            emit(hashSkipping(skip, depth + 1))
            rec(depth + 1, p + 1)
            p += 1
          }
        }
      rec(0, 0)
      out.toArray
    }
  }

  /** All pairs (a_id < b_id) with levenshtein(a_str, b_str) ≤ k.
    * Output columns: a_id, b_id, dist (long).
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               k: Int, q: Int = 2): DataFrame = {
    require(k >= 1 && q >= 1, s"need k>=1, q>=1; got k=$k q=$q")
    val prefixLen = q * k + 1
    // a pair where BOTH strings have |G| <= q*k can evade the prefix
    // filter; bucket those lengths for the all-pairs fallback (see above)
    val shortLen = q * (k + 1) - 1

    val base = df.select(col(idCol).as("sid"), col(strCol).as("str"),
                         length(col(strCol)).as("len"))
    val grammed = base.filter(col("len") >= q)
    val shorts  = base.filter(col("len") <= shortLen)

    // positional q-grams HASHED to 64-bit keys at birth (round 13) via
    // the compiled per-string pass (round 14 — see gramHashesUdf):
    // every downstream operation — duplicate-collapsing count, freq
    // aggregate, prefix rank, candidate equi-join — works on longs
    // (cheaper hashing/compares in the aggregates, 8-byte exchange keys,
    // guide §2.3). Lossless like j17's variant hashing: the prefix
    // theorem holds for ANY shared total order, (freq, hash, occ) is
    // one, and a hash collision only MERGES gram identities — extra
    // candidates the exact verify drops, never a lost pair.
    val grams = grammed.select(col("sid"), col("len"),
      explode(gramHashesUdf(q)(col("str"))).as("g"))
    // (g, occurrence#) tokens WITHOUT a per-(sid, g) window (round 13):
    // the i-th occurrence of g in s is just i = 1..count, so one
    // map-side-combined groupBy collapses duplicate grams and a
    // sequence-explode re-emits the numbered set — same (g, occ) rows
    // the old row_number() produced, with the raw gram stream's
    // duplicates collapsed BEFORE its exchange (guide §2.3) instead of
    // sorted through it (three full-stream window exchanges, one per
    // distinct partitioning, became this one collapsed one).
    // cached: the numbered token set feeds BOTH the freq aggregate and
    // the prefix ranking, and the candidate self-join reads the prefix
    // twice — uncached, Catalyst planned the whole scan→explode→count
    // pipeline once per consumer (4 copies, measured slower than the
    // window form it replaced). One materialization of the collapsed
    // counts; the cheap sequence-explode re-runs from cache.
    val cnts = grams.groupBy("sid", "len", "g").agg(count(lit(1)).as("cnt"))
      .cache()
    // eager materialization (round 14): the freq BROADCAST below is built
    // on a separate thread that starts concurrently with the main job —
    // with the cache still cold, both raced through the full
    // scan→gram→count lineage (the profile showed the ~9 s-CPU gram pass
    // TWICE, once under the broadcast build, once under the action).
    // One count() action pins the cache first; both consumers then read
    // it. Per-invocation state only — Caches.reset drops it between
    // bench runs, so every run still pays the full cost once.
    cnts.count()
    val tokens = cnts.select(col("sid"), col("len"), col("g"),
      explode(expr("sequence(1L, cnt)")).as("occ"))
    // global canonical order: ascending token document-frequency,
    // via partial-aggregated groupBy + BROADCAST join-back (the d2
    // pattern) rather than a count() window partitioned by (g, occ) —
    // the window form moves every token row through a (g, occ)
    // exchange with no map-side combine, and a frequent gram's occ=1
    // partition holds nearly every doc: the exact hot-key skew §2.5
    // warns about. The (g, occ) vocabulary is bounded by |Σ|^q times
    // the max per-doc gram count — independent of corpus size — so the
    // broadcast stays sound at any scale. (Catalyst reuses the cnts
    // exchange for both branches: the token stream is computed once.)
    // freq(g, occ) = #docs holding ≥ occ copies of g = Σ_{c ≥ occ}
    // #docs with exactly c copies — so aggregate the (g, cnt)
    // DISTRIBUTION first (round 14): the old form re-exploded every
    // numbered token (Σcnt ≈ the full gram stream) through a (g, occ)
    // hash aggregate — measured ~10 s CPU at sf0.1, as much as the gram
    // pass itself. cntDist is one map-side-combined pass over the cached
    // cnts rows; the occ re-explosion then runs over the tiny (g, cnt)
    // vocabulary instead of the corpus. Identical freq values by the
    // identity above ⇒ identical prefix order ⇒ identical candidates.
    val cntDist = cnts.groupBy("g", "cnt").agg(count(lit(1)).as("ndocs"))
    val freq = cntDist
      .select(col("g"), explode(expr("sequence(1L, cnt)")).as("occ"),
              col("ndocs"))
      .groupBy("g", "occ").agg(sum("ndocs").as("freq"))
    // broadcast gated on q (round 14, ADVICE): the (g, occ) vocabulary
    // bound |Σ|^q × max-occ is only broadcast-sized for small gram
    // widths; a caller's wide-alphabet q would force an oversized
    // broadcast instead of degrading to a shuffle join, so past q = 3
    // the hint drops and Catalyst picks the strategy from sizes.
    val freqSide = if (q <= 3) broadcast(freq) else freq
    val prefix = tokens.join(freqSide, Seq("g", "occ"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("sid").orderBy(col("freq"), col("g"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select("sid", "len", "g", "occ")
      .cache() // both sides of the candidate self-join read this frame

    // id+length only through the join: the length band prunes here, the
    // string payload never enters the candidate exchange
    val candLong = prefix.select(col("sid").as("a_id"), col("len").as("a_len"),
        col("g"), col("occ"))
      .join(prefix.select(col("sid").as("b_id"), col("len").as("b_len"),
        col("g"), col("occ")), Seq("g", "occ"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(col("a_len") - col("b_len")) <= k)
      .select("a_id", "b_id")

    // the all-pairs fallback runs over DISTINCT short VALUES — that is
    // what makes the |Σ|^(q(k+1)−1) bound real; ids expand back only for
    // value pairs that survive the length filter and the exact verify
    val shortVals = shorts.select("str").distinct()
    val shortValPairs = shortVals.select(col("str").as("a_str"))
      .crossJoin(shortVals.select(col("str").as("b_str")))
      .filter(abs(length(col("a_str")) - length(col("b_str"))) <= k)
      .withColumn("vdist", levenshtein(col("a_str"), col("b_str"), k).cast("long"))
      .filter(col("vdist") >= 0)
    val candShort = shortValPairs
      .join(shorts.select(col("sid").as("a_id"), col("str").as("a_str")), "a_str")
      .join(shorts.select(col("sid").as("b_id"), col("str").as("b_str")), "b_str")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")

    candLong.unionByName(candShort)
      .distinct()
      .join(base.select(col("sid").as("a_id"), col("str").as("a_str")), "a_id")
      .join(base.select(col("sid").as("b_id"), col("str").as("b_str")), "b_id")
      .withColumn("dist", levenshtein(col("a_str"), col("b_str"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select("a_id", "b_id", "dist")
  }

  /** Deletion-neighbourhood edit-distance self-join (the FastSS/SymSpell
    * family): ed(s,t) ≤ k ⟹ deleting ≤ k chars from each side of the
    * alignment reaches a common string, so D≤k(s) ∩ D≤k(t) ≠ ∅ — a lossless
    * candidate condition joined as a plain equi-join on the variant string,
    * then exact-verified with the thresholded levenshtein.
    *
    * Preferred over the q-gram prefix filter for SHORT KEY strings
    * (codes, ids, names): the variant index is n·O(len^k) rows and its
    * buckets are intrinsically tight even on templated keys, where gram
    * blocking drowns (measured at sf0.1 on c_name: 0.98M candidates, max
    * bucket 38, vs 10.4M candidates for the q=2 prefix filter — gram
    * frequencies carry no signal when every string shares the template).
    * For LONG strings (documents) the len^k variant blowup inverts the
    * trade and [[selfJoin]] is the scale path; the crossover is roughly
    * len ≈ 10³ᐟᵏ.
    *
    * 100 TB shape: variant generation is one codegen'd array transform
    * (no shuffle); the only wide op is the equi-join on variants. A hot
    * variant bucket means a genuine near-duplicate cluster — volume AQE
    * splits, not a blocking artifact.
    */
  def deletionSelfJoin(df: DataFrame, idCol: String, strCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"need k>=1; got k=$k")
    val base = df.select(col(idCol).as("sid"), col(strCol).as("str"),
                         length(col(strCol)).as("len"))
    // variants join on their 64-bit hash, not the string (round 13),
    // computed by the compiled deduped pass (round 14 — see
    // deletionHashesUdf; the interpreted nested-HOF form it replaces
    // built every variant string per row): the candidate exchange
    // carries 8 bytes per row instead of a ~len-char variant (guide
    // §2.3 "shuffle keys, not payloads"). Lossless: a hash collision
    // can only MERGE buckets — extra candidate pairs the exact
    // thresholded levenshtein verify below already drops — never
    // separate two rows whose variants are equal.
    val vars = base.select(col("sid"), col("len"),
      explode(deletionHashesUdf(k)(col("str"))).as("v"))
    // id+length only through the variant join; strings re-join after the
    // candidate distinct (same exchange-slimming as selfJoin)
    vars.select(col("sid").as("a_id"), col("len").as("a_len"), col("v"))
      .join(vars.select(col("sid").as("b_id"), col("len").as("b_len"), col("v")),
            Seq("v"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(col("a_len") - col("b_len")) <= k)
      .select("a_id", "b_id").distinct()
      .join(base.select(col("sid").as("a_id"), col("str").as("a_str")), "a_id")
      .join(base.select(col("sid").as("b_id"), col("str").as("b_str")), "b_id")
      .withColumn("dist", levenshtein(col("a_str"), col("b_str"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select("a_id", "b_id", "dist")
  }
}
