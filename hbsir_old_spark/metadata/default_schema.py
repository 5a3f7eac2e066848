"""Default schema DSL: the reference's standard-table derivations
re-declared in the new engine's instruction set.

This captures the SHAPE of /root/reference/hbsir/metadata/schema.yaml's
standard tables (Number_of_Members, Equivalence_Scale, the Expenditures ->
Total_Expenditure chain, the income melt chain — SURVEY §2.2 P18/P20, §2.5
A1) against the synthetic fixture tables of FIXTURES.md. The full 39-year
Iranian-survey metadata is data, not code; engines consume whatever schema
dict they are given, and tests exercise this default.

Year-versioning works anywhere in these dicts (same resolver semantics as
the reference YAML).
"""

from __future__ import annotations

#: household ID layout (FIXTURES.md invariants; reference household.yaml:2-38)
DEFAULT_HOUSEHOLD = {
    "id_length": {1363: 8, 1392: 11},
    "attributes": {
        "Urban_Rural": {
            "position": {1363: {"start": 0, "end": 1}},
            "mapping": {1: "Urban", 2: "Rural"},
        },
        "Province": {
            "position": {1363: {"start": 1, "end": 3}},
            "mapping": None,
        },
        "County": {
            "position": {1363: {"start": 1, "end": 5}},
            "mapping": None,
        },
    },
}

#: commodity classifications (fixture subset mirroring commodities.yaml
#: ranges: food 11100-19999, housing 31100-31999)
DEFAULT_CLASSIFICATIONS = {
    "original": {
        "defaults": {"levels": [1, 2], "aspects": ["item_key"]},
        "items": {
            "food": {"code": {"start": 11100, "end": 20000}, "level": 1},
            "cereals": {"code": {"start": 11100, "end": 11200}, "level": 2},
            "bread": {"code": {"start": 11200, "end": 11300}, "level": 2},
            "meat": {"code": {"start": 11300, "end": 11800}, "level": 2},
            "other_foods": {"code": {"start": 11800, "end": 20000}, "level": 2},
            "housing": {"code": {"start": 31100, "end": 32000}, "level": 1},
        },
    },
    "Food_NonFood": {
        "defaults": {
            "levels": [1],
            "aspects": ["item_key"],
            "missing_value_replacements": {"item_key": "Non-Food"},
        },
        "items": {
            "Food": {"code": {"start": 11100, "end": 20000}, "level": 1},
        },
    },
}

#: standard-table derivations (reference schema.yaml shapes)
DEFAULT_SCHEMA = {
    # original-table pipeline: processed household_information carries the
    # derived Season label (reference applies schema pipelines to original
    # tables too, data_engine.py:511-514)
    "household_information": {
        "instructions": [
            {"apply_external_function": "add_season"},
        ],
    },
    # the Weights standard table (reference schema.yaml:575-588 shape:
    # house_specifications base -> add_weights -> ordered projection)
    "Weights": {
        "table_list": ["house_specifications"],
        "instructions": [
            {"add_weights": None},
            {"apply_order": ["Year", "ID", {"Weight": "float"}]},
        ],
    },
    "Number_of_Members": {
        "table_list": ["members_properties"],
        "instructions": [
            {"apply_external_function": "number_of_members"},
        ],
    },
    "Equivalence_Scale": {
        "table_list": ["Number_of_Members"],
        "instructions": [
            {"apply_external_function": "equivalence_scale"},
        ],
    },
    "Original_Expenditures": {
        # per-year member drift, like schema.yaml:593-618
        "table_list": {1363: ["food"], 1380: ["food", "durable"]},
        "instructions": [
            {"apply_filter": "Code not in [18888, 19993]"},
            {
                "create_column": {
                    "name": "Gross_Expenditure",
                    "type": "numerical",
                    "expression": "Expenditure",
                }
            },
        ],
    },
    "Expenditures": {
        "table_list": ["Original_Expenditures"],
        "instructions": [
            {
                "create_column": {
                    "name": "Yearly_Expenditure",
                    "type": "numerical",
                    "expression": "Gross_Expenditure / Duration * 360",
                }
            },
        ],
    },
    "Total_Expenditure": {
        "table_list": ["Expenditures"],
        "cache_result": True,
        "instructions": [
            {
                "aggregate": {
                    "groupby": ["Year", "ID"],
                    "columns": ["Gross_Expenditure", "Yearly_Expenditure"],
                    "agg": "sum",
                }
            },
        ],
    },
    "Original_Outlays": {
        # outlays net out secondhand sales of durables (schema.yaml outlay
        # chain shape); operand-only coalesce handles the missing column in
        # food via union null-fill
        "table_list": {1363: ["food"], 1380: ["food", "durable"]},
        "instructions": [
            {"apply_filter": "Code not in [18888, 19993]"},
            {
                # the expression is year-versioned like the reference YAML:
                # Secondhand_Sale only exists once durables join the union
                "create_column": {
                    1363: {
                        "name": "Gross_Outlay",
                        "type": "numerical",
                        "expression": "Expenditure",
                    },
                    1380: {
                        "name": "Gross_Outlay",
                        "type": "numerical",
                        "expression": "Expenditure - Secondhand_Sale",
                    },
                }
            },
        ],
    },
    "Outlays": {
        "table_list": ["Original_Outlays"],
        "instructions": [
            {
                "create_column": {
                    "name": "Yearly_Outlay",
                    "type": "numerical",
                    "expression": "Gross_Outlay / Duration * 360",
                }
            },
        ],
    },
    "Total_Outlay": {
        "table_list": ["Outlays"],
        "cache_result": True,
        "instructions": [
            {
                "aggregate": {
                    "groupby": ["Year", "ID"],
                    "columns": ["Gross_Outlay", "Yearly_Outlay"],
                    "agg": "sum",
                }
            },
        ],
    },
    "Imputed_Rent": {
        # housing-code rows (31100-31999) valued as rent (schema.yaml:980-1008
        # shape: code-range filter + per-household sum)
        "table_list": {1363: ["food"], 1380: ["food", "durable"]},
        "instructions": [
            {"apply_filter": "Code >= 31100 & Code < 32000"},
            {
                "create_column": {
                    "name": "Imputed_Rent",
                    "type": "numerical",
                    "expression": "Expenditure",
                }
            },
            {
                "aggregate": {
                    "groupby": ["Year", "ID"],
                    "columns": ["Imputed_Rent"],
                    "agg": "sum",
                }
            },
            {"apply_filter": "Imputed_Rent.notnull() & (Imputed_Rent > 0)"},
        ],
    },
    "_long_other_income": {
        "table_list": ["other_income"],
        "instructions": [
            {
                "melt": {
                    "id_columns": ["Year", "ID", "Member_Number"],
                    "value_columns": [
                        "Retirement", "Rent", "Interest",
                        "Aid", "Home_Production", "Transfer",
                    ],
                    "variable_name": "Income_Type",
                    "value_name": "Income",
                    "drop_nulls": True,
                }
            },
            {"apply_filter": "Income > 0"},
        ],
    },
    "Income_Breakdown": {
        "table_list": ["Incomes"],
        "cache_result": True,
        "instructions": [
            {
                "aggregate": {
                    "groupby": ["Year", "ID", "Income_Type"],
                    "columns": ["Income"],
                    "agg": "sum",
                }
            },
        ],
    },
    "_employment_income_selected": {
        # wage income normalized to (Year, ID, Member_Number, Income_Type,
        # Income) rows — categorical with a None condition labels every row
        # (reference P8 all-rows form)
        "table_list": ["employment_income"],
        "instructions": [
            {
                "create_column": {
                    "name": "Income",
                    "type": "numerical",
                    "expression": "Yearly_Net_Income",
                }
            },
            {
                "create_column": {
                    "name": "Income_Type",
                    "type": "categorical",
                    "categories": {"Employment": None},
                }
            },
            {"apply_filter": "Income > 0"},
            {"apply_order": ["Year", "ID", "Member_Number", "Income_Type", "Income"]},
        ],
    },
    "_self_employed_selected": {
        "table_list": ["self_employed_income"],
        "instructions": [
            {
                "create_column": {
                    "name": "Income",
                    "type": "numerical",
                    "expression": "Profit",
                }
            },
            {
                "create_column": {
                    "name": "Income_Type",
                    "type": "categorical",
                    "categories": {"Self_Employment": None},
                }
            },
            {"apply_filter": "Income > 0"},
            {"apply_order": ["Year", "ID", "Member_Number", "Income_Type", "Income"]},
        ],
    },
    "_subsidy_selected": {
        # cash subsidies exist from 1390 onward, open-ended (reference
        # schema.yaml:1066-1070 joins subsidy into Cash_Incomes from 1390)
        "years": {"start": 1390, "end": 9999},
        "table_list": ["subsidy"],
        "instructions": [
            {
                "create_column": {
                    "name": "Income",
                    "type": "numerical",
                    "expression": "Subsidy",
                }
            },
            {
                "create_column": {
                    "name": "Income_Type",
                    "type": "categorical",
                    "categories": {"Subsidy": None},
                }
            },
            {"apply_filter": "Income > 0"},
            {"apply_order": ["Year", "ID", "Member_Number", "Income_Type", "Income"]},
        ],
    },
    "Incomes": {
        # the union of every income source in long form (the table the
        # reference declares but never defines — SURVEY §1.1 note — given a
        # real definition here)
        "table_list": [
            "_employment_income_selected",
            "_self_employed_selected",
            "_long_other_income",
            "_subsidy_selected",
        ],
    },
    "Members_Income_Breakdown": {
        "table_list": ["Incomes"],
        "instructions": [
            {
                "aggregate": {
                    "groupby": ["Year", "ID", "Member_Number", "Income_Type"],
                    "columns": ["Income"],
                    "agg": "sum",
                }
            },
        ],
    },
    "Members_Total_Income": {
        "table_list": ["Members_Income_Breakdown"],
        "cache_result": True,
        "instructions": [
            {
                "aggregate": {
                    "groupby": ["Year", "ID", "Member_Number"],
                    "columns": ["Income"],
                    "agg": "sum",
                }
            },
        ],
    },
    "Total_Income": {
        "table_list": ["Income_Breakdown"],
        "cache_result": True,
        "instructions": [
            {
                "aggregate": {
                    "groupby": ["Year", "ID"],
                    "columns": ["Income"],
                    "agg": "sum",
                }
            },
        ],
    },
}
