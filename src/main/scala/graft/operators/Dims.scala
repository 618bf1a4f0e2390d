package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** The 10 star-schema dimension builders (SURVEY.md §3.2, reference
  * etl_completo.py). Each takes CRM-shaped input `DataFrame`s and returns the
  * DW dimension with the exact columns of the reference's INSERT list plus a
  * dense surrogate key.
  *
  * Only the EXECUTED reference variants are implemented (Python
  * last-def-wins, SURVEY §3.3): the live `vendedor` (etl_completo.py:502-538)
  * and live `loja` (:540-588) definitions.
  *
  * Scale notes (100 TB): every lookup join here is dimension × dimension —
  * broadcast by construction. Surrogate keys on dims use the global-window
  * path (dims stay small by definition); nothing in this file shuffles more
  * than one dimension.
  */
object Dims {

  /** Python truthiness on FK probes (`if id_x:` — reference
    * etl_completo.py:321,327,374,638,...): 0 and NULL both mean "no key".
    * Nulling the key makes the subsequent equi-join miss, which is exactly
    * the reference's skip-the-lookup behavior.
    */
  def pyKey(c: Column): Column = when(c.isNull || c === 0, lit(null)).otherwise(c)

  /** dim_localidade (etl_completo.py:145-184): DISTINCT extract (P2), F1
    * clean on cidade/estado, F3 on regiao (falsy→'N/A' via the outer guard
    * at :168), F4 capital flag on the CLEANED pair (:169); raw `regiao` is
    * kept alongside the standardized one (:177).
    */
  def dimLocalidade(localidade: DataFrame): DataFrame = {
    val cleaned = localidade
      .select("id_localidade", "cidade", "estado", "regiao").distinct()
      .select(
        col("id_localidade"),
        when(col("cidade").isNull || col("cidade") === "", lit("N/A"))
          .otherwise(cleanText(col("cidade"))).as("cidade"),
        when(col("estado").isNull || col("estado") === "", lit("N/A"))
          .otherwise(cleanText(col("estado"))).as("estado"),
        col("regiao"),
        when(col("regiao").isNull || col("regiao") === "", lit("N/A"))
          .otherwise(standardizeRegion(col("regiao"))).as("regiao_padronizada"))
      .withColumn("eh_capital", isCapital(col("cidade"), col("estado")))
    Surrogate.withSurrogateKey(cleaned, "sk_localidade", Seq(col("id_localidade")))
      .select("sk_localidade", "id_localidade", "cidade", "estado", "regiao",
        "regiao_padronizada", "eh_capital")
  }

  /** dim_categoria_cliente (etl_completo.py:186-221): F1 clean
    * (falsy→'Não Definido', :206) + F5 tiering on the cleaned name (:207). */
  def dimCategoriaCliente(categoriaCliente: DataFrame): DataFrame = {
    val cleaned = categoriaCliente.select(
      col("id_categoria_cliente"),
      when(col("nome_categoria_cliente").isNull || col("nome_categoria_cliente") === "",
        lit("Não Definido"))
        .otherwise(cleanText(col("nome_categoria_cliente"))).as("nome_categoria_cliente"))
      .withColumn("categoria_padronizada", standardizeCustomerCategory(col("nome_categoria_cliente")))
    Surrogate.withSurrogateKey(cleaned, "sk_categoria_cliente", Seq(col("id_categoria_cliente")))
      .select("sk_categoria_cliente", "id_categoria_cliente", "nome_categoria_cliente",
        "categoria_padronizada")
  }

  /** dim_categoria_produto (etl_completo.py:223-258): F1 + F6. */
  def dimCategoriaProduto(categoriaProduto: DataFrame): DataFrame = {
    val cleaned = categoriaProduto.select(
      col("id_categoria_produto"),
      when(col("nome_categoria_produto").isNull || col("nome_categoria_produto") === "",
        lit("Não Definido"))
        .otherwise(cleanText(col("nome_categoria_produto"))).as("nome_categoria_produto"))
      .withColumn("categoria_padronizada", standardizeProductCategory(col("nome_categoria_produto")))
    Surrogate.withSurrogateKey(cleaned, "sk_categoria_produto", Seq(col("id_categoria_produto")))
      .select("sk_categoria_produto", "id_categoria_produto", "nome_categoria_produto",
        "categoria_padronizada")
  }

  /** dim_fornecedor (etl_completo.py:260-296): pais_origem is extracted
    * (:269) but DISCARDED at insert (:284-289) — replicated by not selecting
    * it. sk_localidade hardwired NULL (:283).
    */
  def dimFornecedor(fornecedores: DataFrame): DataFrame = {
    val cleaned = fornecedores.select(
      col("id_fornecedor"),
      when(col("nome_fornecedor").isNull || col("nome_fornecedor") === "", lit("Fornecedor N/A"))
        .otherwise(cleanText(col("nome_fornecedor"))).as("nome_fornecedor"))
      .withColumn("nome_padronizado", standardizeName(col("nome_fornecedor")))
      .withColumn("sk_localidade", lit(null).cast("long"))
      .withColumn("status_fornecedor", lit("ATIVO"))
    Surrogate.withSurrogateKey(cleaned, "sk_fornecedor", Seq(col("id_fornecedor")))
      .select("sk_fornecedor", "id_fornecedor", "nome_fornecedor", "nome_padronizado",
        "sk_localidade", "status_fornecedor")
  }

  /** dim_cliente (etl_completo.py:298-351): J10/J11 SK lookups (left
    * broadcast joins, miss ⇒ NULL), F1/F2 name cleanup, current_date stamp.
    */
  def dimCliente(cliente: DataFrame, dimCategoriaCliente: DataFrame,
                 dimLocalidade: DataFrame): DataFrame = {
    val catLookup = dimCategoriaCliente.select(
      col("id_categoria_cliente").as("__cat_id"), col("sk_categoria_cliente"))
    val locLookup = dimLocalidade.select(
      col("id_localidade").as("__loc_id"), col("sk_localidade"))
    val joined = cliente
      .withColumn("__cat_key", pyKey(col("id_categoria_cliente")))
      .withColumn("__loc_key", pyKey(col("id_localidade")))
      .join(broadcast(catLookup), col("__cat_key") === col("__cat_id"), "left")
      .join(broadcast(locLookup), col("__loc_key") === col("__loc_id"), "left")
      .select(
        col("id_cliente"),
        when(col("nome_cliente").isNull || col("nome_cliente") === "", lit("Cliente N/A"))
          .otherwise(cleanText(col("nome_cliente"))).as("nome_cliente"),
        col("sk_categoria_cliente"), col("sk_localidade"))
      .withColumn("nome_padronizado", standardizeName(col("nome_cliente")))
      .withColumn("data_cadastro", current_date())
      .withColumn("status_cliente", lit("ATIVO"))
    Surrogate.withSurrogateKey(joined, "sk_cliente", Seq(col("id_cliente")))
      .select("sk_cliente", "id_cliente", "nome_cliente", "nome_padronizado",
        "sk_categoria_cliente", "sk_localidade", "data_cadastro", "status_cliente")
  }

  /** dim_produto (etl_completo.py:353-407): J12 category lookup + A1/J14
    * decorrelated per-product AVG(preco_venda) (the reference's correlated
    * scalar subquery at :381-385 becomes one hash aggregate + broadcast
    * join), cost estimated at 70% of avg price (:390), margin (:391).
    */
  def dimProduto(produto: DataFrame, itemVendas: DataFrame,
                 dimCategoriaProduto: DataFrame): DataFrame = {
    val catLookup = dimCategoriaProduto.select(
      col("id_categoria_produto").as("__cat_id"), col("sk_categoria_produto"))
    // A1 decorrelated: one shuffle-agg over item_vendas instead of N point
    // queries. AVG ignores NULL prices like PostgreSQL; NULL avg → 0.0 (:385).
    // stableAvg2 = decimal-exact sum / count, so the value is identical
    // regardless of partitioning/engine summation order.
    val avgPrice = itemVendas.groupBy(col("id_produto").as("__prod_id"))
      .agg(graft.functions.GraftFunctions.stableAvg2(col("preco_venda")).as("__preco_medio"))
    val joined = produto
      .withColumn("__cat_key", pyKey(col("id_categoria_produto")))
      .join(broadcast(catLookup), col("__cat_key") === col("__cat_id"), "left")
      .join(avgPrice, col("id_produto") === col("__prod_id"), "left")
      .withColumn("preco_unitario", coalesce(col("__preco_medio"), lit(0.0)))
      .select(
        col("id_produto"),
        when(col("nome_produto").isNull || col("nome_produto") === "", lit("Produto N/A"))
          .otherwise(cleanText(col("nome_produto"))).as("nome_produto"),
        col("sk_categoria_produto"), col("preco_unitario"))
      .withColumn("nome_padronizado", standardizeName(col("nome_produto")))
      .withColumn("custo_unitario",
        when(col("preco_unitario") > 0, col("preco_unitario") * 0.7).otherwise(0.0))
      .withColumn("margem_lucro",
        when(col("preco_unitario") > 0,
          (col("preco_unitario") - col("custo_unitario")) / col("preco_unitario") * 100)
          .otherwise(0.0))
      .withColumn("status_produto", lit("ATIVO"))
    Surrogate.withSurrogateKey(joined, "sk_produto", Seq(col("id_produto")))
      .select("sk_produto", "id_produto", "nome_produto", "nome_padronizado",
        "sk_categoria_produto", "preco_unitario", "custo_unitario", "margem_lucro",
        "status_produto")
  }

  /** dim_vendedor — the LIVE second definition (etl_completo.py:502-538;
    * the richer :409-448 variant is shadowed dead code, SURVEY §3.3). */
  def dimVendedor(vendedor: DataFrame): DataFrame = {
    val cleaned = vendedor.select(
      col("id_vendedor"),
      when(col("nome_vendedor").isNull || col("nome_vendedor") === "", lit("Vendedor N/A"))
        .otherwise(cleanText(col("nome_vendedor"))).as("nome_vendedor"))
      .withColumn("nome_padronizado", standardizeName(col("nome_vendedor")))
      .withColumn("sk_localidade", lit(null).cast("long"))
      .withColumn("status_vendedor", lit("ATIVO"))
    Surrogate.withSurrogateKey(cleaned, "sk_vendedor", Seq(col("id_vendedor")))
      .select("sk_vendedor", "id_vendedor", "nome_vendedor", "nome_padronizado",
        "sk_localidade", "status_vendedor")
  }

  /** dim_loja — the LIVE second definition (etl_completo.py:540-588): J13
    * case-insensitive (cidade, estado) localidade lookup with `LIMIT 1`
    * first-match (P6 — reproduced by keeping only the lowest-sk row per
    * lowered key pair before the broadcast join), probe side `.strip()`ed
    * (:566), guard `if cidade and estado` (:561), F7 store-type classify on
    * the CLEANED name (:574).
    */
  def dimLoja(lojas: DataFrame, dimLocalidade: DataFrame): DataFrame = {
    val locKeyed = dimLocalidade.select(
      lower(col("cidade")).as("__l_cidade"), lower(col("estado")).as("__l_estado"),
      col("sk_localidade"))
    val locFirst = Surrogate.firstMatch(locKeyed,
      Seq(col("__l_cidade"), col("__l_estado")), Seq(col("sk_localidade")))
    val probed = lojas
      .withColumn("__p_cidade",
        when(col("cidade").isNull || col("cidade") === "" ||
          col("estado").isNull || col("estado") === "", lit(null))
          .otherwise(lower(trim(col("cidade")))))
      .withColumn("__p_estado", lower(trim(col("estado"))))
      .join(broadcast(locFirst),
        col("__p_cidade") === col("__l_cidade") && col("__p_estado") === col("__l_estado"),
        "left")
    val cleaned = probed.select(
      col("id_loja"),
      when(col("nome_loja").isNull || col("nome_loja") === "", lit("Loja N/A"))
        .otherwise(cleanText(col("nome_loja"))).as("nome_loja"),
      col("sk_localidade"))
      .withColumn("nome_padronizado", standardizeName(col("nome_loja")))
      .withColumn("tipo_loja", classifyStoreType(col("nome_loja")))
      .withColumn("status_loja", lit("ATIVA"))
    Surrogate.withSurrogateKey(cleaned, "sk_loja", Seq(col("id_loja")))
      .select("sk_loja", "id_loja", "nome_loja", "nome_padronizado", "sk_localidade",
        "tipo_loja", "status_loja")
  }

  /** dim_promocao (etl_completo.py:707-766): F1 clean (falsy→'Promoção N/A',
    * :727), F8 classify on the cleaned name (:728), F9 percent extraction
    * (:731-740), P8 sentinel→NULL dates (:746-750). The reference stores the
    * raw string into a DATE column (which would fail on dd/MM/yyyy in
    * PostgreSQL); we implement the evident intent and parse both formats.
    */
  def dimPromocao(promocoes: DataFrame): DataFrame = {
    val cleaned = promocoes.select(
      col("id_promocao"),
      when(col("nome_promocao").isNull || col("nome_promocao") === "", lit("Promoção N/A"))
        .otherwise(cleanText(col("nome_promocao"))).as("nome_promocao"),
      col("tipo_desconto"), col("data_inicio"), col("data_fim"))
      .withColumn("tipo_promocao", classifyPromotionType(col("nome_promocao")))
      .withColumn("percentual_desconto", extractPercent(col("tipo_desconto")))
      .withColumn("data_inicio", sentinelToNullDate(col("data_inicio")))
      .withColumn("data_fim", sentinelToNullDate(col("data_fim")))
      .withColumn("status_promocao", lit("ATIVA"))
    Surrogate.withSurrogateKey(cleaned, "sk_promocao", Seq(col("id_promocao")))
      .select("sk_promocao", "id_promocao", "nome_promocao", "tipo_promocao",
        "percentual_desconto", "data_inicio", "data_fim", "status_promocao")
  }

  /** dim_tempo (etl_completo.py:768-808): daily rows 2020-01-01..2025-12-31
    * inclusive (2,192 rows) with F15 calendar attributes — Portuguese names
    * from the literal arrays at :787-789, NOT locale formatting. Generated
    * with `explode(sequence(...))` (F16).
    */
  def dimTempo(spark: SparkSession): DataFrame = {
    val dates = spark.sql(
      "SELECT explode(sequence(to_date('2020-01-01'), to_date('2025-12-31'), interval 1 day)) AS data_completa")
    val d = col("data_completa")
    // LongType to match the oracle engine's BIGINT date-part functions.
    val enriched = dates
      .withColumn("ano", year(d).cast("long"))
      .withColumn("mes", month(d).cast("long"))
      .withColumn("dia", dayofmonth(d).cast("long"))
      .withColumn("trimestre", quarter(d).cast("long"))
      .withColumn("semestre", semestre(d).cast("long"))
      .withColumn("dia_semana", diaSemana(d).cast("long"))
      .withColumn("nome_dia_semana", nomeDiaSemana(d))
      .withColumn("nome_mes", nomeMes(d))
      .withColumn("eh_fim_semana", ehFimSemana(d))
    Surrogate.withSurrogateKey(enriched, "sk_tempo", Seq(d))
      .select("sk_tempo", "data_completa", "ano", "mes", "dia", "trimestre", "semestre",
        "dia_semana", "nome_dia_semana", "nome_mes", "eh_fim_semana")
  }
}
