package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dims, Fact}
import graft.sources.Crm

/** Full star-schema build (SURVEY.md §3.1 `run_full_etl` as plain dataflow):
  * dimension dependency order becomes val ordering; Catalyst handles the
  * rest. Dims are not cached here — at the per-query grain each is a small
  * broadcast build; callers doing the full multi-output ETL should
  * `.cache()` dims before the fact (SURVEY §4.1).
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

  /** Build everything from the CRM-shaped derivations of a testdata dir. */
  def build(spark: SparkSession, dir: String): Warehouse = {
    val dimLocalidade = Dims.dimLocalidade(Crm.localidade(spark, dir))
    val dimCategoriaCliente = Dims.dimCategoriaCliente(Crm.categoriaCliente(spark, dir))
    val dimCategoriaProduto = Dims.dimCategoriaProduto(Crm.categoriaProduto(spark, dir))
    val dimFornecedor = Dims.dimFornecedor(Crm.fornecedores(spark, dir))
    val dimCliente = Dims.dimCliente(Crm.cliente(spark, dir), dimCategoriaCliente, dimLocalidade)
    val dimProduto = Dims.dimProduto(Crm.produto(spark, dir), Crm.itemVendas(spark, dir), dimCategoriaProduto)
    val dimVendedor = Dims.dimVendedor(Crm.vendedor(spark, dir))
    val dimLoja = Dims.dimLoja(Crm.lojas(spark, dir), dimLocalidade)
    val dimPromocao = Dims.dimPromocao(Crm.promocoes(spark, dir))
    val dimTempo = Dims.dimTempo(spark)
    val fato = Fact.fatoVendas(Crm.vendas(spark, dir), Crm.itemVendas(spark, dir),
      dimTempo, dimCliente, dimProduto, dimVendedor, dimLoja)
    Warehouse(dimLocalidade, dimCategoriaCliente, dimCategoriaProduto, dimFornecedor,
      dimCliente, dimProduto, dimVendedor, dimLoja, dimPromocao, dimTempo, fato)
  }
}
