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
    * tables, etl_completo.py §S7/S8): one atomic parquet directory per DW
    * table. Parquet + min-max statistics take the role of the reference's 21
    * post-load b-tree indices (SURVEY §2.1 S9); at 100 TB the fact would
    * additionally be written `partitionBy` a date-derived column — not done
    * here because the testdata fact is a single small table.
    */
  def write(outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
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

  /** One Warehouse per (session, dir): `build` is called by several queries
    * (`q_fato_vendas`, `q_report_summary`, `entry`) in one session; without
    * memoization each call re-runs the analyzer over all 11 plans and re-asks
    * the CacheManager to cache already-cached data (r2 verdict #3).
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Warehouse]()

  /** Build everything from the CRM-shaped derivations of a testdata dir
    * (memoized per session+dir; a fresh session rebuilds). */
  def build(spark: SparkSession, dir: String): Warehouse =
    built.computeIfAbsent((spark, dir), _ => buildUncached(spark, dir))

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
