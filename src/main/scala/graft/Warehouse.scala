package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dims, Fact}
import graft.sources.Crm

/** Full star-schema build (SURVEY.md §3.1 `run_full_etl` as plain dataflow):
  * dimension dependency order becomes val ordering; Catalyst handles the
  * rest. Dims are CACHED (SURVEY §4.1 "materialize before probe"): each is
  * tiny but expression-heavy (UDF clean + window SK), and the fact build +
  * the summary report would otherwise re-execute every dim subplan per
  * consumer. The CacheManager's canonical-plan matching also substitutes
  * these for the standalone q_dim_* queries in the same session. The fact
  * itself is NOT cached — it is the streamed output of the ETL.
  */
final case class Warehouse(
    dimLocalidade: DataFrame,
    dimCategoriaCliente: DataFrame,
    dimCategoriaProduto: DataFrame,
    dimFornecedor: DataFrame,
    dimCliente: DataFrame,
    dimProduto: DataFrame,
    dimVendedor: DataFrame,
    dimLoja: DataFrame,
    dimPromocao: DataFrame,
    dimTempo: DataFrame,
    fatoVendas: DataFrame) {

  /** The ETL "load" step (reference: per-row INSERTs into PostgreSQL DW
    * tables, etl_completo.py §S7/S8): one atomic columnar directory per DW
    * table. Columnar min-max statistics take the role of the reference's 21
    * post-load b-tree indices (SURVEY §2.1 S9; see [[writeFactIndexed]] for
    * the sorted form); at 100 TB the fact would additionally be written
    * `partitionBy` a date-derived column ([[writeFactPartitioned]]).
    * `format` accepts any columnar batch format on the classpath —
    * "parquet" (default) or "orc", matching the `orc:` read locator.
    */
  def write(outDir: String, format: String = "parquet",
            decimalExact: Boolean = false): Unit =
    sinkTables(decimalExact).foreach { case (name, df) =>
      df.write.mode("overwrite").format(format).save(s"$outDir/$name")
    }

  /** The 100 TB fact layout: partitioned by sale year (`ano_particao`), so
    * time-windowed consumers prune whole partitions at the file listing —
    * the role the reference's date-keyed b-tree index plays. On the small
    * testdata this is demonstration (WarehouseSpec asserts the pruned scan);
    * at scale add a second level (month) and size partitions to ≥128 MB
    * files.
    */
  def writeFactPartitioned(outDir: String): Unit =
    fatoVendas.write.mode("overwrite")
      .partitionBy("ano_particao").parquet(s"$outDir/fato_vendas_part")

  /** S9 analogue — the index-like layout. The reference's 21 post-load
    * b-tree indices (sql/cria_indices_dw.sql:9-37) have no DDL counterpart
    * in Spark; their ROLE — point/range lookups that touch a fraction of
    * the fact — is played by SORTED parquet: globally range-partition and
    * sort the fact by the hot lookup key (the reference indexes the fact
    * by date, product, customer and store keys — pick the one the
    * deployment's point queries lead with) so each row group's min-max
    * envelope is narrow and the reader SKIPS row groups the predicate
    * excludes. Same scan API, no index maintenance, and at 100 TB the skip
    * happens at the footer before any column data is read. WarehouseSpec
    * proves it with scan metrics: a point predicate over this layout emits
    * a fraction of the rows the unsorted layout emits. `blockSize` shrinks
    * row groups on small testdata so the skip is observable; production
    * keeps the 128 MB default.
    */
  def writeFactIndexed(outDir: String, sortKey: String = "sk_produto",
                       blockSize: Int = 128 * 1024 * 1024): Unit =
    fatoVendas
      .repartitionByRange(org.apache.spark.sql.functions.col(sortKey))
      .sortWithinPartitions(sortKey)
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      .parquet(s"$outDir/fato_vendas_idx")

  /** The reference's ACTUAL load target: INSERTs into a relational DW over
    * JDBC (etl_completo.py:32-46 opens the PostgreSQL connection; the
    * per-table loads insert at :688-698 and :914-927). `df.write.jdbc`
    * ships each partition over its own connection with `batchsize` rows per
    * round-trip — the distributed counterpart of the reference's single
    * psycopg2 cursor, and at 100 TB the parallel-load lever (1000 executors
    * = 1000 concurrent COPY-ish streams; size `numPartitions` to what the
    * target DB accepts). Dimension tables coalesce to one partition — a
    * 30-row dim needs one connection, not 32 — while the fact keeps its
    * partitioning. Derby-tested (WarehouseSpec), like the JDBC source.
    */
  def writeJdbc(url: String, mode: String = "overwrite",
                decimalExact: Boolean = false): Unit =
    sinkTables(decimalExact).foreach { case (name, df) =>
      val out = if (name == "fato_vendas") df else df.coalesce(1)
      out.write.mode(mode).option("batchsize", "10000")
        .jdbc(url, name, new java.util.Properties())
    }

  /** Stage-level BEST-EFFORT load — the reference's error model
    * (etl_completo.py:184,704 et al.): every stage is its own
    * try / log / roll back / continue block, so one failing dimension
    * never aborts the others. The rollback analogue is Spark's per-
    * directory commit protocol: a failed job commits nothing to the
    * target, exactly as the reference's `conn_dw.rollback()` leaves the
    * stage's table untouched. Returns one (table, error) row per stage —
    * `None` = loaded; the caller decides whether partial success is
    * acceptable (the reference always continued).
    */
  def writeBestEffort(outDir: String, format: String = "parquet",
                      decimalExact: Boolean = false): Seq[(String, Option[String])] =
    sinkTables(decimalExact).map { case (name, df) =>
      try {
        df.write.mode("overwrite").format(format).save(s"$outDir/$name")
        name -> None
      } catch {
        case e: Exception =>
          name -> Some(s"${e.getClass.getName}: ${e.getMessage}")
      }
    }

  /** Sink-facing table list. With `decimalExact`, money/percent columns are
    * cast to the reference DW DDL's exact DECIMAL types
    * (sql/cria_dw.sql:79-81,112,134-141) so a BI tool pointed at the sink
    * sees money-typed columns, not doubles. The ENGINE keeps DoubleType
    * throughout (SURVEY §1.2 — doubles reproduce the reference's observed
    * Python-float arithmetic); the cast happens once, at the sink boundary,
    * with HALF_UP rounding to the DDL scale — the same rounding PostgreSQL
    * applies on INSERT of an over-precise value.
    */
  def sinkTables(decimalExact: Boolean): Seq[(String, DataFrame)] =
    if (!decimalExact) tables
    else tables.map { case (name, df) => name -> Warehouse.withDdlDecimals(name, df) }

  /** Idempotent load (S7 — the reference's `INSERT … ON CONFLICT DO NOTHING`,
    * etl_completo.py:172-177 et al.): rows whose natural key already exists
    * in the target are skipped, only new keys are appended, so a re-run over
    * the same inputs is a no-op. Per table: one key-columns-only read of the
    * target (parquet column pruning — the existing data is never rewritten)
    * + one left-anti join + an append. At 100 TB that is a key-scan and an
    * append, never a rewrite; a true upsert (`MERGE … WHEN MATCHED UPDATE`)
    * needs a transactional table format, which the reference does not use
    * either.
    */
  def writeIdempotent(outDir: String): Unit =
    tables.foreach { case (name, df) =>
      import org.apache.spark.sql.functions.{col, lit, max, coalesce}
      val target = s"$outDir/$name"
      val spark = df.sparkSession
      val path = new org.apache.hadoop.fs.Path(target)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val keys = Warehouse.naturalKeys(name)
      // ON CONFLICT DO NOTHING also fires WITHIN one load: a batch carrying
      // the same PK twice keeps only the first insert. The fact grain
      // (id_venda, id_produto) genuinely repeats in the source (lineitem
      // re-lists a part within an order), so the idempotent target holds
      // exactly one row per natural key — first-wins per key, with the
      // run's sk as the deterministic-within-run tiebreak. Dimension
      // natural keys are unique by construction (PK sources), no-op there.
      val batch = Warehouse.regeneratedSks.get(name) match {
        case Some(sk) => operators.Surrogate.firstMatch(df, keys.map(col), Seq(col(sk)))
        case None => df
      }
      if (!fs.exists(path)) batch.write.mode("overwrite").parquet(target)
      else {
        val existing = spark.read.parquet(target)
        val delta = batch.join(existing.select(keys.map(col): _*), keys, "left_anti")
        // Surrogate keys that are generated fresh per run (the fact's
        // sk_venda comes from monotonically_increasing_id) could collide
        // with sks already in a partially-written target — exactly the
        // interrupted-load scenario idempotent load exists for (r3 advice).
        // Re-base the appended sks above max(existing): delta sks are ≥ 1,
        // so old + max(existing) is both unique within the delta and
        // strictly greater than every existing sk. Dimension sks are
        // deterministic (row_number over the natural-key order) and need no
        // re-basing. The max() is a single-scalar aggregate of one pruned
        // parquet column — not a driver-side data loop.
        val appended = Warehouse.regeneratedSks.get(name) match {
          case Some(sk) =>
            val maxSk = existing.agg(coalesce(max(col(sk)), lit(0L))).collect()(0).getLong(0)
            delta.withColumn(sk, col(sk) + lit(maxSk))
          case None => delta
        }
        appended.write.mode("append").parquet(target)
      }
    }

  def tables: Seq[(String, DataFrame)] = Seq(
    "dim_localidade" -> dimLocalidade,
    "dim_categoria_cliente" -> dimCategoriaCliente,
    "dim_categoria_produto" -> dimCategoriaProduto,
    "dim_fornecedor" -> dimFornecedor,
    "dim_cliente" -> dimCliente,
    "dim_produto" -> dimProduto,
    "dim_vendedor" -> dimVendedor,
    "dim_loja" -> dimLoja,
    "dim_promocao" -> dimPromocao,
    "dim_tempo" -> dimTempo,
    "fato_vendas" -> fatoVendas)
}

object Warehouse {

  /** Natural (conflict) keys = the reference's PRIMARY KEYs
    * (sql/create_tables.sql:15,22,27,32,37,45,53,59,68,81,95): dimensions on
    * their business id, the item-grain fact on (id_venda, id_produto);
    * dim_tempo keys on the calendar date itself.
    */
  val naturalKeys: Map[String, Seq[String]] = Map(
    "dim_localidade" -> Seq("id_localidade"),
    "dim_categoria_cliente" -> Seq("id_categoria_cliente"),
    "dim_categoria_produto" -> Seq("id_categoria_produto"),
    "dim_fornecedor" -> Seq("id_fornecedor"),
    "dim_cliente" -> Seq("id_cliente"),
    "dim_produto" -> Seq("id_produto"),
    "dim_vendedor" -> Seq("id_vendedor"),
    "dim_loja" -> Seq("id_loja"),
    "dim_promocao" -> Seq("id_promocao"),
    "dim_tempo" -> Seq("data_completa"),
    "fato_vendas" -> Seq("id_venda", "id_produto"))

  /** Tables whose surrogate key is generated fresh per run (not derivable
    * from the natural-key order) and must therefore be re-based above the
    * target's max on idempotent top-up appends.
    */
  val regeneratedSks: Map[String, String] = Map("fato_vendas" -> "sk_venda")

  /** The reference DW DDL's DECIMAL column types, per table
    * (sql/cria_dw.sql:79-81 dim_produto, :112 dim_promocao,
    * :134-141 fato_vendas). Only columns present in the built table are
    * cast — the engine's fact omits none of these, but the guard keeps the
    * map robust to schema evolution.
    */
  val ddlDecimals: Map[String, Map[String, org.apache.spark.sql.types.DecimalType]] = {
    import org.apache.spark.sql.types.DecimalType
    val d10 = DecimalType(10, 2); val d12 = DecimalType(12, 2); val d5 = DecimalType(5, 2)
    Map(
      "dim_produto" -> Map(
        "preco_unitario" -> d10, "custo_unitario" -> d10, "margem_lucro" -> d5),
      "dim_promocao" -> Map("percentual_desconto" -> d5),
      "fato_vendas" -> Map(
        "preco_unitario_venda" -> d10, "valor_total_item" -> d12,
        "custo_unitario" -> d10, "custo_total_item" -> d12,
        "lucro_bruto" -> d12, "percentual_desconto" -> d5,
        "valor_desconto" -> d10, "valor_final" -> d12))
  }

  /** Cast `df`'s money columns to the DDL-exact decimal schema for `name`
    * (identity for tables the DDL types without decimals). */
  def withDdlDecimals(name: String, df: DataFrame): DataFrame =
    ddlDecimals.get(name) match {
      case None => df
      case Some(cols) =>
        import org.apache.spark.sql.functions.col
        cols.foldLeft(df) { case (acc, (c, t)) =>
          if (acc.columns.contains(c)) acc.withColumn(c, col(c).cast(t)) else acc
        }
    }

  /** One Warehouse per (session, dir): `build` is called by several queries
    * (`q_fato_vendas`, `q_report_summary`, `entry`) in one session; without
    * memoization each call re-runs the analyzer over all 11 plans and re-asks
    * the CacheManager to cache already-cached data (r2 verdict #3).
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Warehouse]()

  /** Build everything from the CRM-shaped derivations of a testdata dir
    * (memoized per session+dir; a fresh session rebuilds). Entries whose
    * SparkContext has stopped are purged on each call, so a long-lived
    * driver that cycles sessions does not retain dead sessions and their
    * cached plans forever (r3 advice).
    */
  def build(spark: SparkSession, dir: String): Warehouse = {
    built.keySet.removeIf(k => k._1.sparkContext.isStopped)
    built.computeIfAbsent((spark, dir), _ => buildUncached(spark, dir))
  }

  private def buildUncached(spark: SparkSession, dir: String): Warehouse = {
    val dimLocalidade = Dims.dimLocalidade(Crm.localidade(spark, dir)).cache()
    val dimCategoriaCliente = Dims.dimCategoriaCliente(Crm.categoriaCliente(spark, dir)).cache()
    val dimCategoriaProduto = Dims.dimCategoriaProduto(Crm.categoriaProduto(spark, dir)).cache()
    val dimFornecedor = Dims.dimFornecedor(Crm.fornecedores(spark, dir)).cache()
    val dimCliente = Dims.dimCliente(Crm.cliente(spark, dir), dimCategoriaCliente, dimLocalidade).cache()
    val dimProduto = Dims.dimProduto(Crm.produto(spark, dir), Crm.itemVendas(spark, dir), dimCategoriaProduto).cache()
    val dimVendedor = Dims.dimVendedor(Crm.vendedor(spark, dir)).cache()
    val dimLoja = Dims.dimLoja(Crm.lojas(spark, dir), dimLocalidade).cache()
    val dimPromocao = Dims.dimPromocao(Crm.promocoes(spark, dir)).cache()
    val dimTempo = Dims.dimTempo(spark).cache()
    // The fact is cached too: it is the materialized END PRODUCT of the ETL
    // (the reference writes it into the DW once and every consumer reads
    // that) — the summary report and the fact query both consume it.
    val fato = Fact.fatoVendas(Crm.vendas(spark, dir), Crm.itemVendas(spark, dir),
      dimTempo, dimCliente, dimProduto, dimVendedor, dimLoja).cache()
    Warehouse(dimLocalidade, dimCategoriaCliente, dimCategoriaProduto, dimFornecedor,
      dimCliente, dimProduto, dimVendedor, dimLoja, dimPromocao, dimTempo, fato)
  }
}
