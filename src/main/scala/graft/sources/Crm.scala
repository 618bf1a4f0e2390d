package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CRM-shaped input tables derived deterministically from the driver's
  * TPC-H-ish testdata (FIXTURES.md §C role mapping). The engine's operators
  * take these as inputs; [[OracleSql]] holds the byte-identical DuckDB CTE
  * derivations so every query stays oracle-checkable.
  *
  * The CASE-based "noise" injections exist to exercise the reference's
  * dirty-data paths (FIXTURES.md §A): whitespace runs, case variants, NULLs,
  * sentinel/invalid dates, non-positive measures, Python-falsy (0) FK keys.
  * Every expression here must stay expressible in ANSI-ish SQL — when you
  * change one side, change [[OracleSql]] in lockstep.
  */
object Crm {

  /** Raw-table access, dispatched on the locator: a `jdbc:` URL reads the
    * named table over JDBC (reference parity — etl_completo.py:16-30 reads
    * the CRM from PostgreSQL via psycopg2); a `csv:` prefix reads
    * `<name>.csv` files (the landing format real CRM dumps arrive in —
    * header + inferred schema; no pushdown or min-max pruning, so at scale
    * CSV is an INGESTION format only: land, convert to parquet, then run);
    * anything else is a parquet directory (the driver testdata, and the
    * default). Every derivation below — and therefore every SparkEntry
    * query — works against any source unchanged.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith("jdbc:")) jdbcTable(spark, dir, name)
    else if (dir.startsWith("csv:"))
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"${dir.stripPrefix("csv:")}/$name.csv")
    else if (dir.startsWith("json:"))
      // JSON-lines landing format (API exports / event dumps). Like CSV:
      // schema inferred, no pushdown — an ingestion format, convert to
      // parquet before running at scale.
      spark.read.json(s"${dir.stripPrefix("json:")}/$name.json")
    else if (dir.startsWith("orc:"))
      // ORC: the other first-class columnar format — unlike the landing
      // formats it keeps predicate pushdown, column pruning, and stripe
      // min-max statistics, so it is a full-citizen RUNTIME format for
      // deployments whose lake is ORC rather than parquet.
      spark.read.orc(s"${dir.stripPrefix("orc:")}/$name.orc")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Numeric split column per raw table: with it, the JDBC scan fans out as
    * `numPartitions` range-predicated queries across executors instead of
    * one single-connection read — the difference between a day and an hour
    * against a real CRM database. Dimension-sized tables read fine on one
    * connection and stay unlisted.
    */
  private val JdbcSplitColumn = Map(
    "customer" -> "c_custkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "part" -> "p_partkey", "supplier" -> "s_suppkey")

  /** JDBC read of one table. The min/max bounds come from a driver-side
    * metadata query (two-value result — negligible next to the scan it
    * parallelizes); dialect-neutral plain JDBC avoids subquery-alias quirks.
    */
  def jdbcTable(spark: SparkSession, url: String, name: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", name).option("fetchsize", "10000")
    JdbcSplitColumn.get(name).flatMap { k =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(s"SELECT MIN($k), MAX($k) FROM $name")
        rs.next()
        val lo = rs.getLong(1)
        if (rs.wasNull()) None else Some((k, lo, rs.getLong(2)))
      } finally conn.close()
    } match {
      case Some((k, lo, hi)) =>
        base.option("partitionColumn", k)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", spark.sparkContext.defaultParallelism.min(32))
          .load()
      case None => base.load()
    }
  }

  /** localidade(id_localidade, cidade, estado, regiao) ← nation ⋈ region. */
  def localidade(spark: SparkSession, dir: String): DataFrame = {
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region")
    n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(
        col("n_nationkey").as("id_localidade"),
        when(col("n_nationkey") === 2, "São Paulo")
          .when(col("n_nationkey") === 14, "  brasília  ")
          .when(col("n_nationkey") % 4 === 0, concat(lit("  "), col("n_name")))
          .when(col("n_nationkey") % 4 === 1, lower(col("n_name")))
          .when(col("n_nationkey") % 4 === 3, concat(col("n_name"), lit("  ")))
          .otherwise(col("n_name")).as("cidade"),
        when(col("n_nationkey") === 2, "SP")
          .when(col("n_nationkey") === 14, "df")
          .otherwise(upper(substring(col("n_name"), 1, 2))).as("estado"),
        when(col("n_nationkey") === 2, "são paulo")
          .when(col("n_nationkey") === 24, " RIO GRANDE DO SUL ")
          .when(col("n_nationkey") === 7, lit(null))
          .when(col("n_nationkey") % 3 === 0, lower(col("r_name")))
          .when(col("n_nationkey") % 3 === 1, concat(col("r_name"), lit(" ")))
          .otherwise(col("r_name")).as("regiao"))
  }

  /** categoria_cliente(id, nome, _seg) ← distinct customer segments; the
    * `_seg` helper column carries the join key for [[cliente]]. */
  def categoriaCliente(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(col("c_mktsegment")).distinct()
      .withColumn("id_categoria_cliente",
        row_number().over(Window.orderBy(col("c_mktsegment"))).cast("long"))
      .select(
        col("id_categoria_cliente"),
        when(col("c_mktsegment") === "BUILDING", "Clientes VIP building")
          .when(col("c_mktsegment") === "AUTOMOBILE", "categoria  gold")
          .when(col("c_mktsegment") === "MACHINERY", " Prata maquinas ")
          .when(col("c_mktsegment") === "HOUSEHOLD", lit(null))
          .otherwise(col("c_mktsegment")).as("nome_categoria_cliente"),
        col("c_mktsegment").as("_seg"))

  /** Full CRM cliente schema (sql/create_tables.sql:58-65) including the
    * declared-but-unused `idade`/`genero` (SURVEY §1.3) — the reference's
    * extraction projects them away (etl_completo.py:306-310), so dim_cliente
    * never carries them, but a CRM reader must expose them.
    */
  def cliente(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val cat = categoriaCliente(spark, dir)
    c.join(broadcast(cat), c("c_mktsegment") === cat("_seg"))
      .select(
        col("c_custkey").as("id_cliente"),
        when(col("c_custkey") % 5 === 0, lower(col("c_name")))
          .when(col("c_custkey") % 5 === 1, concat(lit("  "), col("c_name"), lit(" ")))
          .when(col("c_custkey") % 5 === 2,
            concat(lit("cliente da silva "), col("c_custkey").cast("string")))
          .when(col("c_custkey") % 5 === 3, lit(null))
          .otherwise(col("c_name")).as("nome_cliente"),
        when(col("c_custkey") % 11 === 0, lit(null))
          .otherwise((col("c_custkey") % 60 + 18).cast("long")).as("idade"),
        when(col("c_custkey") % 3 === 0, lit("F"))
          .when(col("c_custkey") % 3 === 1, lit("M"))
          .otherwise(lit(null)).as("genero"),
        when(col("c_custkey") % 50 === 0, lit(null))
          .otherwise(col("id_categoria_cliente")).as("id_categoria_cliente"),
        when(col("c_custkey") % 37 === 0, lit(null))
          .otherwise(col("c_nationkey").cast("long")).as("id_localidade"))
  }

  /** categoria_produto(id, nome, _brand) ← distinct part brands. */
  def categoriaProduto(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part").select(col("p_brand")).distinct()
      .withColumn("id_categoria_produto",
        row_number().over(Window.orderBy(col("p_brand"))).cast("long"))
      .select(
        col("id_categoria_produto"),
        when(col("p_brand") === "Brand#11", lit(null))
          .when(col("p_brand").like("Brand#2%"), lower(col("p_brand")))
          .when(col("p_brand").like("Brand#3%"), concat(lit("  "), col("p_brand")))
          .otherwise(col("p_brand")).as("nome_categoria_produto"),
        col("p_brand").as("_brand"))

  def produto(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
    val cat = categoriaProduto(spark, dir)
    p.join(broadcast(cat), p("p_brand") === cat("_brand"))
      .select(
        col("p_partkey").as("id_produto"),
        when(col("p_partkey") % 7 === 0, lit(null))
          .when(col("p_partkey") % 7 === 3, upper(col("p_name")))
          .otherwise(col("p_name")).as("nome_produto"),
        when(col("p_partkey") % 41 === 0, lit(null))
          .otherwise(col("id_categoria_produto")).as("id_categoria_produto"))
  }

  def fornecedores(spark: SparkSession, dir: String): DataFrame = {
    val s = table(spark, dir, "supplier")
    val n = table(spark, dir, "nation")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .select(
        col("s_suppkey").as("id_fornecedor"),
        when(col("s_suppkey") % 6 === 0, lit(null))
          .when(col("s_suppkey") % 6 === 1, concat(lower(col("s_name")), lit("  ltda")))
          .when(col("s_suppkey") % 6 === 2, concat(lit(" "), col("s_name"), lit(" de  comercio")))
          .otherwise(col("s_name")).as("nome_fornecedor"),
        col("n_name").as("pais_origem"))
  }

  def vendedor(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier").select(
      col("s_suppkey").as("id_vendedor"),
      when(col("s_suppkey") % 4 === 0,
        concat(lit("vendedor da  casa "), col("s_suppkey").cast("string")))
        .when(col("s_suppkey") % 4 === 1, lit(null))
        .otherwise(lower(col("s_name"))).as("nome_vendedor"))

  /** lojas ← nation; cidade/estado reuse the [[localidade]] expressions so
    * the J13 (lower(cidade), lower(estado)) lookup finds matches. */
  def lojas(spark: SparkSession, dir: String): DataFrame =
    localidade(spark, dir).select(
      col("id_localidade").as("id_loja"),
      col("cidade"), col("estado"))
      .join(broadcast(table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("id_loja") === col("n_nationkey"))
      .select(
        col("id_loja"),
        when(col("n_nationkey") % 5 === 0, concat(lit("Shopping "), col("n_name")))
          .when(col("n_nationkey") % 5 === 1, concat(col("n_name"), lit(" centro")))
          .when(col("n_nationkey") % 5 === 2, concat(lit("OUTLET "), col("n_name")))
          .when(col("n_nationkey") % 5 === 3, lit(null))
          .otherwise(concat(lit("Loja "), col("n_name"))).as("nome_loja"),
        concat(lit("Gerente "), col("n_name")).as("gerente_loja"),
        col("cidade"), col("estado"))

  def promocoes(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "nation").select(
      (col("n_nationkey") + 1).cast("long").as("id_promocao"),
      when(col("n_nationkey") === 13, lit(null))
        .when(col("n_nationkey") % 4 === 0, concat(lit("black friday "), col("n_name")))
        .when(col("n_nationkey") % 4 === 1, lit("Promoção de  Natal"))
        .when(col("n_nationkey") % 4 === 2, concat(lit("LIQUIDAÇÃO total "), col("n_name")))
        .otherwise(concat(lit("Oferta "), col("n_name"))).as("nome_promocao"),
      when(col("n_nationkey") % 5 === 0, "10%")
        .when(col("n_nationkey") % 5 === 1, "desconto de 12.5 por cento")
        .when(col("n_nationkey") % 5 === 2, "sem desconto")
        .when(col("n_nationkey") % 5 === 3, lit(null))
        .otherwise(lit("25.0%")).as("tipo_desconto"),
      when(col("n_nationkey") % 4 === 0, "2024-01-15")
        .when(col("n_nationkey") % 4 === 1, "15/03/2024")
        .when(col("n_nationkey") % 4 === 2, "Data Inválida")
        .otherwise(lit(null)).as("data_inicio"),
      when(col("n_nationkey") % 3 === 0, "2024-12-31")
        .when(col("n_nationkey") % 3 === 1, "N/A")
        .otherwise(lit("")).as("data_fim"))

  /** vendas ← orders. data_venda exercises all F13 paths: ISO, BR slash,
    * NULL, sentinel (kept w/ null sk) and a well-shaped-but-invalid date
    * (dropped). id_loja includes 0 — Python-falsy, skipped lookup. */
  def vendas(spark: SparkSession, dir: String): DataFrame =
    vendasFrom(table(spark, dir, "orders"))

  /** The vendas derivation over any orders-shaped relation — shared by the
    * batch reader above and the streaming fact load (the same projection
    * over `readStream`), so both paths are provably identical. */
  def vendasFrom(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("id_venda"),
      when(col("o_orderkey") % 10 === 5, lit(null))
        .when(col("o_orderkey") % 10 === 8, lit("Data Inválida"))
        .when(col("o_orderkey") % 10 === 9, lit("2024-13-45"))
        .when(col("o_orderkey") % 10 === 6 || col("o_orderkey") % 10 === 7,
          date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("data_venda"),
      when(col("o_orderkey") % 31 === 0, lit(null)).otherwise(col("o_custkey")).as("id_cliente"),
      (col("o_orderkey") % 7 + 1).as("id_vendedor"),
      (col("o_orderkey") % 25).as("id_loja"),
      col("o_totalprice").as("valor_total"))

  /** item_vendas ← lineitem; injects non-positive qty/price rows (P9/F12). */
  def itemVendas(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").select(
      col("l_orderkey").as("id_venda"),
      col("l_partkey").as("id_produto"),
      when(col("l_linenumber") === 6, 0)
        .when(col("l_linenumber") === 7, -2)
        .otherwise(col("l_quantity").cast("int")).as("qtd_vendida"),
      when(col("l_partkey") % 101 === 0, -col("l_extendedprice"))
        .otherwise(col("l_extendedprice")).as("preco_venda"),
      when((col("l_orderkey") + col("l_partkey")) % 5 === 0,
        (col("l_partkey") % 25 + 1).cast("long"))
        .otherwise(lit(null)).as("id_promocao_aplicada"))
}
