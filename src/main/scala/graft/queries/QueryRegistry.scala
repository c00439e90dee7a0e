package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry assembling every query module into the driver contract maps. */
object QueryRegistry {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship: TPC-H Q1-shaped pricing summary. */
  def flagship(spark: SparkSession, dir: String): DataFrame =
    TpchQueries.q01_pricing_summary(spark, dir)

  def all: Map[String, Q] =
    TpchQueries.entries ++ EventQueries.entries ++ TextQueries.entries ++
      EmbeddingQueries.entries ++ MultimodalQueries.entries ++
      StreamingQueries.entries ++ SqlQueries.entries ++ CorpusQueries.entries ++
      CurationQueries.entries ++ NexmarkQueries.entries ++ DagQueries.entries

  def oracles: Map[String, String] =
    TpchQueries.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++
      EmbeddingQueries.oracles ++ MultimodalQueries.oracles ++
      StreamingQueries.oracles ++ SqlQueries.oracles ++ CorpusQueries.oracles ++
      CurationQueries.oracles ++ NexmarkQueries.oracles ++ DagQueries.oracles
}
