package graft

import org.apache.spark.sql.functions._
import graft.streaming.FactStream

/** Incremental streaming fact load == batch fact build (minus the sk). */
class FactStreamSpec extends SparkSpec {

  test("stream-static incremental fact equals the batch fact") {
    val dir = "/root/testdata/sf0.001"
    val w = Warehouse.build(spark, dir)
    val streamed = FactStream.incrementalFact(spark, dir,
      w.dimTempo, w.dimCliente, w.dimProduto, w.dimVendedor, w.dimLoja,
      "fact_stream_spec_sink")

    val batch = w.fatoVendas
    assert(streamed.count() === batch.count())

    // full-row equivalence on the natural grain + all measures/FKs
    val cols = Seq("id_venda", "id_produto", "sk_tempo", "sk_cliente",
      "sk_produto", "sk_vendedor", "sk_loja", "quantidade_vendida",
      "preco_unitario_venda", "valor_total_item", "valor_final",
      "custo_unitario").map(col)
    val a = streamed.select(cols: _*)
    val b = batch.select(cols: _*)
    assert(a.exceptAll(b).count() === 0L, "streamed rows missing from batch")
    assert(b.exceptAll(a).count() === 0L, "batch rows missing from stream")
  }
}
