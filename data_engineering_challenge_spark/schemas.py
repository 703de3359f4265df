"""Schema registry: explicit StructTypes + per-column regex contracts.

Replaces the reference's three-layer schema system (SURVEY.md §1.4):
fixed DDL (src/db/sql/schema.sql:1-43), inference with overrides
(src/utils/dataset_profiling.py:174-184), and the regex "semantic
schema" (src/etl/tables/schemas_regex.py:29-57).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-shaped tables (FIXTURES.md §A) -------------------------

_tx_cols: list[tuple[str, T.DataType, bool]] = [
    ("point_de_vente", T.StringType(), False),
    ("numero_tpv", T.StringType(), True),  # absent in one raw file (drift)
    ("numero_transaction", T.StringType(), False),
    ("date_transaction", T.DateType(), False),
    ("heure", T.StringType(), False),  # no TIME type in Spark (SURVEY §7.3)
    ("typologie_magasin", T.StringType(), True),
    ("numero_fidelite", T.StringType(), True),
    ("type_de_vente", T.StringType(), True),
    ("univers_produit", T.StringType(), True),
    ("segment_produit", T.StringType(), True),
    ("famille_produit", T.StringType(), True),
    ("sous_famille_produit", T.StringType(), True),
    ("fedas_numero", T.StringType(), True),
    ("fedas_libelle", T.StringType(), True),
    ("cible_genre_age", T.StringType(), True),
    ("modele_couleur_ref", T.StringType(), False),
    ("modele_couleur_libelle", T.StringType(), True),
    ("type_de_vente_nps", T.StringType(), True),
    ("quantite_vendue", T.LongType(), True),
    ("ca_net_ttc", T.DecimalType(18, 6), True),
    ("ca_net_ht", T.DecimalType(18, 6), True),
    ("marge_nette_magasin", T.DecimalType(18, 6), True),
]

TRANSACTIONS_SCHEMA = T.StructType(
    [T.StructField(n, t, nullable) for n, t, nullable in _tx_cols]
)

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("code_modele_couleur_actuel", T.StringType(), False),
        T.StructField("signature_product", T.BooleanType(), True),
    ]
)

# regex contracts — the "semantic schema" (schemas_regex.py:29-57)
TRANSACTIONS_PATTERNS: dict[str, str] = {
    "point_de_vente": r"^PDV-id-\d+$",
    "numero_tpv": r"^TPV_\d+$",
    "numero_transaction": r"^TID\d+$",
    "date_transaction": r"^\d{4}-\d{2}-\d{2}$",
    "heure": r"^\d{2}:\d{2}:\d{2}$",
    "typologie_magasin": r"^Typologie_Magasin_\d+$",
    "numero_fidelite": r"^N_\d+$",
    "type_de_vente": r"^TV\d+$",
    "univers_produit": r"^CL1_\d+$",
    "segment_produit": r"^CL2_\d+$",
    "famille_produit": r"^CL3_\d+$",
    "sous_famille_produit": r"^CL4_\d+$",
    "fedas_numero": r"^FedasNum\d+$",
    "fedas_libelle": r"^FedasLib\d+$",
    "cible_genre_age": r"^CGA\d+$",
    "modele_couleur_ref": r"^MCR\d+$",
    "modele_couleur_libelle": r"^MCL\d+$",
    "type_de_vente_nps": r"^NPS\d+$",
    "quantite_vendue": r"^[+-]?\d+$",
    "ca_net_ttc": r"^[+-]?\d+(?:[.,]\d+)?$",
    "ca_net_ht": r"^[+-]?\d+(?:[.,]\d+)?$",
    "marge_nette_magasin": r"^[+-]?\d+(?:[.,]\d+)?$",
}

PRODUCT_PATTERNS: dict[str, str] = {
    "code_modele_couleur_actuel": r"^MCR\d+$",
    "signature_product": r"^(?i)(true|false|0|1|)$",
}

# the 15-column duplicate-audit key subset (notebook cells 27-28)
DUP_AUDIT_COLUMNS: tuple[str, ...] = (
    "numero_transaction", "point_de_vente", "fedas_numero", "fedas_libelle",
    "date_transaction", "heure", "typologie_magasin", "type_de_vente",
    "cible_genre_age", "modele_couleur_ref", "modele_couleur_libelle",
    "type_de_vente_nps", "quantite_vendue", "marge_nette_magasin", "ca_net_ht",
)

# --- testdata contracts (driver tables) -------------------------------

ORDERS_PATTERNS: dict[str, str] = {
    "o_orderstatus": r"^[OF]$",  # 'P' rows violate → nonzero invalid count
    "o_orderpriority": r"^[0-9]-[A-Z]+$",  # spaces violate ('4-NOT SPECIFIED')
}

LINEITEM_PATTERNS: dict[str, str] = {
    "l_returnflag": r"^[ANR]$",
    "l_linestatus": r"^[OF]$",
}
