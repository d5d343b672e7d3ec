"""Built-in Jinja macros.

The reference ships these in the external ``dbt-adapters`` global macro
project (SURVEY.md §2.1 note); their behavior is pinned by the
reference's functional tests, and here they're re-expressed in the
Spark SQL dialect (the ``spark__*`` shims of SURVEY.md §2.5
"cross-db macro shims").

Generic test shapes follow the documented dbt semantics: the test query
returns the FAILING rows; the runner wraps it in
``select count(*) ...`` (``core/dbt/task/test.py:126-174``).
"""

GENERIC_TEST_MACROS = r"""
{% macro test_unique(model, column_name) %}
select
    {{ column_name }} as unique_field,
    count(*) as n_records
from {{ model }}
where {{ column_name }} is not null
group by {{ column_name }}
having count(*) > 1
{% endmacro %}

{% macro test_not_null(model, column_name) %}
select *
from {{ model }}
where {{ column_name }} is null
{% endmacro %}

{% macro test_accepted_values(model, column_name, values, quote=True) %}
with all_values as (
    select
        {{ column_name }} as value_field,
        count(*) as n_records
    from {{ model }}
    group by {{ column_name }}
)
select *
from all_values
where value_field not in (
    {% for value in values -%}
    {% if quote %}'{{ value }}'{% else %}{{ value }}{% endif %}{% if not loop.last %}, {% endif %}
    {%- endfor %}
)
{% endmacro %}

{% macro test_relationships(model, column_name, to, field) %}
with child as (
    select {{ column_name }} as from_field
    from {{ model }}
    where {{ column_name }} is not null
),
parent as (
    select {{ field }} as to_field
    from {{ to }}
)
select from_field
from child
left join parent on child.from_field = parent.to_field
where parent.to_field is null
{% endmacro %}

{% macro get_where_subquery(relation, where=None) %}
{%- if where -%}
(select * from {{ relation }} where {{ where }}) sparkt_subquery
{%- else -%}
{{ relation }}
{%- endif -%}
{% endmacro %}
"""

CROSS_DB_MACROS = r"""
{% macro dateadd(datepart, interval, from_date_or_timestamp) -%}
timestampadd({{ datepart }}, {{ interval }}, {{ from_date_or_timestamp }})
{%- endmacro %}

{% macro datediff(first_date, second_date, datepart) -%}
timestampdiff({{ datepart }}, {{ first_date }}, {{ second_date }})
{%- endmacro %}

{% macro date_trunc(datepart, date) -%}
date_trunc('{{ datepart }}', {{ date }})
{%- endmacro %}

{% macro last_day(date, datepart) -%}
{%- if datepart == 'month' -%}
last_day({{ date }})
{%- else -%}
cast(date_trunc('{{ datepart }}', timestampadd({{ datepart }}, 1, {{ date }})) as date) - interval 1 day
{%- endif -%}
{%- endmacro %}

{% macro concat(fields) -%}
concat({{ fields | join(', ') }})
{%- endmacro %}

{% macro string_literal(value) -%}
'{{ value }}'
{%- endmacro %}

{% macro escape_single_quotes(expression) -%}
{{ expression | replace("'", "\\'") }}
{%- endmacro %}

{% macro split_part(string_text, delimiter_text, part_number) -%}
split_part({{ string_text }}, {{ delimiter_text }}, {{ part_number }})
{%- endmacro %}

{% macro position(substring_text, string_text) -%}
position({{ substring_text }} in {{ string_text }})
{%- endmacro %}

{% macro right(string_text, length_expression) -%}
right({{ string_text }}, {{ length_expression }})
{%- endmacro %}

{% macro length(expression) -%}
length({{ expression }})
{%- endmacro %}

{% macro replace(field, old_chars, new_chars) -%}
replace({{ field }}, {{ old_chars }}, {{ new_chars }})
{%- endmacro %}

{% macro type_string() -%}string{%- endmacro %}
{% macro type_int() -%}int{%- endmacro %}
{% macro type_bigint() -%}bigint{%- endmacro %}
{% macro type_numeric() -%}decimal(28, 6){%- endmacro %}
{% macro type_float() -%}double{%- endmacro %}
{% macro type_timestamp() -%}timestamp{%- endmacro %}
{% macro type_boolean() -%}boolean{%- endmacro %}

{% macro current_timestamp() -%}
current_timestamp()
{%- endmacro %}

{% macro hash(field) -%}
md5(cast({{ field }} as string))
{%- endmacro %}

{% macro generate_surrogate_key(field_list) -%}
md5(concat_ws('-',
    {%- for field in field_list %}
    coalesce(cast({{ field }} as string), '_dbt_utils_surrogate_key_null_'){% if not loop.last %},{% endif %}
    {%- endfor %}
))
{%- endmacro %}

{% macro safe_cast(field, type) -%}
try_cast({{ field }} as {{ type }})
{%- endmacro %}

{% macro cast_bool_to_text(field) -%}
cast({{ field }} as string)
{%- endmacro %}

{% macro bool_or(expression) -%}
bool_or({{ expression }})
{%- endmacro %}

{#- listagg honors order_by_clause ("order by <expr> [desc]") and
    limit_num, matching the reference's fixture_listagg.py expected
    outputs (bottom_ordered / bottom_ordered_limited): sort a
    struct(order_key, value) array — array_sort orders by the first
    field — then project the value back out. r15 review: the old shim
    silently IGNORED order_by_clause, returning unordered rows where
    the reference test pins '1,a,p'-style ordered output. -#}
{% macro listagg(measure, delimiter_text="','", order_by_clause=None, limit_num=None) -%}
{%- if order_by_clause -%}
{%- set ob = order_by_clause | trim -%}
{%- set ob = ob[9:] if ob.lower().startswith('order by ') else ob -%}
{%- set is_desc = ob.lower().endswith(' desc') -%}
{%- set okey = (ob[:-5] if is_desc else (ob[:-4] if ob.lower().endswith(' asc') else ob)) | trim -%}
array_join(
    {% if limit_num %}slice({% endif %}transform({% if is_desc %}reverse({% endif %}array_sort(collect_list(struct({{ okey }} as o, {{ measure }} as v))){% if is_desc %}){% endif %}, x -> x.v){% if limit_num %}, 1, {{ limit_num }}){% endif %},
    {{ delimiter_text }}
)
{%- else -%}
array_join(
    {% if limit_num %}slice({% endif %}collect_list({{ measure }}){% if limit_num %}, 1, {{ limit_num }}){% endif %},
    {{ delimiter_text }}
)
{%- endif -%}
{%- endmacro %}

{% macro array_construct(inputs=[], data_type='int') -%}
array({{ inputs | join(', ') }})
{%- endmacro %}

{% macro array_append(array, new_element) -%}
array_append({{ array }}, {{ new_element }})
{%- endmacro %}

{% macro array_concat(array_1, array_2) -%}
concat({{ array_1 }}, {{ array_2 }})
{%- endmacro %}

{% macro except() -%}
except
{%- endmacro %}

{% macro intersect() -%}
intersect
{%- endmacro %}

{% macro limit_zero() -%}
limit 0
{%- endmacro %}

{% macro get_limit_sql(sql, limit) -%}
select * from ( {{ sql }} ) as model_limit_subq {% if limit is not none %}limit {{ limit }}{% endif %}
{%- endmacro %}

{% macro statement(name=None, fetch_result=False) %}
{%- set compiled = caller() -%}
{%- do _submit_statement(name, compiled, fetch_result) -%}
{% endmacro %}
"""

BUILTIN_MACRO_SOURCES = [GENERIC_TEST_MACROS, CROSS_DB_MACROS]
