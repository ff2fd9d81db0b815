package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{q, qRowsOnly}
import graft.ml.Pipelines
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 — ML surface queries. The two deterministic feature
  * transforms are DuckDB-oracle-checked; model training/eval queries are
  * rows-only (training isn't SQL-expressible) with behavior asserted in
  * MLSpec.
  */
object MLQueries {

  val defs: Seq[QueryDef] = Seq(

    // M1 — label encoding. StringIndexer(alphabetAsc) ≡ sklearn
    // LabelEncoder's lexicographic codes ≡ dense_rank over sorted labels.
    q("m1_string_index",
      """SELECT d.doc_id, CAST(i.idx AS DOUBLE) AS lang_idx
        |FROM documents d
        |JOIN (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS idx
        |      FROM (SELECT DISTINCT lang FROM documents)) i
        |  ON d.lang = i.lang
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val indexer = new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol("lang").setOutputCol("lang_idx")
        .setStringOrderType("alphabetAsc")
      indexer.fit(docs).transform(docs)
        .select("doc_id", "lang_idx")
        .orderBy("doc_id")
    },

    // M3 — standardization: scaled = (x − mean) / stddev_samp, checked
    // on the first embedding dimension against the SQL formula
    q("m3_standard_scaler",
      """SELECT vec_id,
        |       round((CAST(embedding[1] AS DOUBLE) - m) / sd, 6) AS z0
        |FROM embeddings,
        |     (SELECT avg(CAST(embedding[1] AS DOUBLE)) AS m,
        |             stddev_samp(CAST(embedding[1] AS DOUBLE)) AS sd
        |      FROM embeddings)
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Pipelines.firstScaledElement(
          Pipelines.withFeatures(Tables.load(s, dir, "embeddings")))
        .select(col("vec_id"), round(col("scaled0"), 6).as("z0"))
        .orderBy("vec_id")
    },

    // M4+M7+M10 — multinomial LR: 80/20 split (seed 42), accuracy +
    // log-loss metrics. Rows-only: training isn't SQL-expressible.
    qRowsOnly("m2_lr_metrics") { (s, dir) =>
      Pipelines.lrMetrics(Tables.load(s, dir, "embeddings"), "label")
        .orderBy("metric")
    },

    // M5+M10 — RandomForest confusion matrix over the held-out split
    qRowsOnly("m4_rf_confusion") { (s, dir) =>
      Pipelines.rfConfusion(Tables.load(s, dir, "embeddings"))
        .orderBy("label", "prediction")
    },

    // M8 — feed-forward network (Keras 64→32→16→softmax equivalent)
    qRowsOnly("m5_mlp_metrics") { (s, dir) =>
      Pipelines.mlpMetrics(Tables.load(s, dir, "embeddings"))
        .orderBy("metric")
    },

    // M9 — CrossValidator hyperparameter search (grid over regParam)
    qRowsOnly("m6_cv_search") { (s, dir) =>
      Pipelines.cvBestRegParam(Tables.load(s, dir, "embeddings"))
        .orderBy("regParam")
    },
  )
}
