package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-table profiler for the Warehouse ETL build (dev-only). */
object WarehouseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    import graft.operators.{Dims, Fact}
    import graft.sources.Crm
    val t0 = System.nanoTime()
    val dimLocalidade = t("construct dim_localidade")(Dims.dimLocalidade(Crm.localidade(spark, sfDir)).cache())
    val dimCategoriaCliente = t("construct dim_categoria_cliente")(Dims.dimCategoriaCliente(Crm.categoriaCliente(spark, sfDir)).cache())
    val dimCategoriaProduto = t("construct dim_categoria_produto")(Dims.dimCategoriaProduto(Crm.categoriaProduto(spark, sfDir)).cache())
    val dimFornecedor = t("construct dim_fornecedor")(Dims.dimFornecedor(Crm.fornecedores(spark, sfDir)).cache())
    val dimCliente = t("construct dim_cliente")(Dims.dimCliente(Crm.cliente(spark, sfDir), dimCategoriaCliente, dimLocalidade).cache())
    val dimProduto = t("construct dim_produto")(Dims.dimProduto(Crm.produto(spark, sfDir), Crm.itemVendas(spark, sfDir), dimCategoriaProduto).cache())
    val dimVendedor = t("construct dim_vendedor")(Dims.dimVendedor(Crm.vendedor(spark, sfDir)).cache())
    val dimLoja = t("construct dim_loja")(Dims.dimLoja(Crm.lojas(spark, sfDir), dimLocalidade).cache())
    val dimPromocao = t("construct dim_promocao")(Dims.dimPromocao(Crm.promocoes(spark, sfDir)).cache())
    val dimTempo = t("construct dim_tempo")(Dims.dimTempo(spark).cache())
    val fato = t("construct fato")(Fact.fatoVendas(Crm.vendas(spark, sfDir), Crm.itemVendas(spark, sfDir),
      dimTempo, dimCliente, dimProduto, dimVendedor, dimLoja).cache())
    Seq("dim_localidade" -> dimLocalidade, "dim_cliente" -> dimCliente,
      "dim_produto" -> dimProduto, "dim_tempo" -> dimTempo, "fato" -> fato)
      .foreach { case (name, df) => t(s"materialize $name")(df.count()) }
    println(f"[prof] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
