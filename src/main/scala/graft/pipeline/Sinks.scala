package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Jet service-factory (reference: pipeline/ServiceFactory.java): a recipe for a
  * non-serializable per-task resource (connection, client, model handle).
  * `create` runs inside the task, once per partition.
  */
final case class ServiceFactory[S](createFn: () => S, destroyFn: S => Unit = (_: S) => ())
    extends Serializable {
  def create(): S = createFn()
  def destroy(s: S): Unit = destroyFn(s)
}

object ServiceFactories {
  /** Jet `ServiceFactories.sharedService` / `nonSharedService` collapse to the
    * same per-partition lifecycle here (tasks are the unit of parallelism).
    */
  def service[S](create: () => S, destroy: S => Unit = (_: S) => ()): ServiceFactory[S] =
    ServiceFactory(create, destroy)
}

/** Batch sink vocabulary (reference: pipeline/Sinks.java). */
trait Sink { def write(df: DataFrame): Unit }

object Sinks {

  /** Jet `Sinks.files` (Sinks.java:1026): format in {parquet,csv,json,text}. */
  def files(path: String, format: String = "parquet",
            mode: String = "overwrite",
            options: Map[String, String] = Map.empty): Sink = new Sink {
    def write(df: DataFrame): Unit =
      df.write.mode(mode).options(options).format(format).save(path)
  }

  def json(path: String): Sink = files(path, "json")
  def csv(path: String): Sink = files(path, "csv", options = Map("header" -> "true"))

  /** Jet `Sinks.logger` (Sinks.java:1067): print a bounded sample. */
  def logger(n: Int = 20): Sink = new Sink {
    def write(df: DataFrame): Unit = df.show(n, truncate = false)
  }

  /** Jet `Sinks.noop` (Sinks.java:1084): full evaluation, discard output. */
  def noop: Sink = new Sink {
    def write(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
  }

  /** Jet `Sinks.map` (Sinks.java:136): upsert into a named KV store. */
  def map(name: String, keyCols: String*): Sink = new Sink {
    def write(df: DataFrame): Unit = KeyedStore.upsert(name, df, keyCols)
  }

  /** Jet `Sinks.list` (Sinks.java:754): append to a named list. */
  def list(name: String): Sink = new Sink {
    def write(df: DataFrame): Unit = KeyedStore.append(name, df)
  }

  /** Jet `Sinks.jdbc` (Sinks.java:1246). */
  def jdbc(url: String, table: String, props: java.util.Properties): Sink = new Sink {
    def write(df: DataFrame): Unit = df.write.mode("append").jdbc(url, table, props)
  }
}
