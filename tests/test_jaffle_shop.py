"""Jaffle-shop fixture flow (reference: tests/fixtures/jaffle_shop.py +
jaffle_shop_data): 3 seeds → staging views → joined marts with a Jinja
for-loop pivot, plus generic tests — the reference's canonical
realistic project."""

from __future__ import annotations

RAW_CUSTOMERS = "id,first_name,last_name\n1,Ann,Ames\n2,Bob,Best\n3,Cal,Cole\n"
RAW_ORDERS = (
    "id,user_id,order_date,status\n"
    "1,1,2018-01-01,completed\n"
    "2,1,2018-01-05,returned\n"
    "3,2,2018-01-07,completed\n"
    "4,3,2018-02-01,placed\n"
)
RAW_PAYMENTS = (
    "id,order_id,payment_method,amount\n"
    "1,1,credit_card,1000\n"
    "2,2,coupon,500\n"
    "3,3,bank_transfer,2000\n"
    "4,4,gift_card,300\n"
    "5,1,coupon,100\n"
)

ORDERS_SQL = """
{{ config(materialized='table') }}
{% set payment_methods = ['credit_card', 'coupon', 'bank_transfer', 'gift_card'] %}
with orders as (select * from {{ ref('stg_orders') }}),
payments as (select * from {{ ref('stg_payments') }}),
order_payments as (
    select order_id,
    {% for pm in payment_methods %}
    sum(case when payment_method = '{{ pm }}' then amount else 0 end)
        as {{ pm }}_amount,
    {% endfor %}
    sum(amount) as total_amount
    from payments group by order_id
)
select o.id as order_id, o.user_id as customer_id, o.order_date, o.status,
    {% for pm in payment_methods %}
    op.{{ pm }}_amount,
    {% endfor %}
    op.total_amount as amount
from orders o
left join order_payments op on o.id = op.order_id
"""

CUSTOMERS_SQL = """
{{ config(materialized='table') }}
with customers as (select * from {{ ref('stg_customers') }}),
orders as (select * from {{ ref('orders') }}),
customer_orders as (
    select customer_id,
        min(order_date) as first_order,
        max(order_date) as most_recent_order,
        count(order_id) as number_of_orders,
        sum(amount) as customer_lifetime_value
    from orders group by customer_id
)
select c.id as customer_id, c.first_name, c.last_name,
       co.first_order, co.most_recent_order,
       coalesce(co.number_of_orders, 0) as number_of_orders,
       coalesce(co.customer_lifetime_value, 0) as customer_lifetime_value
from customers c
left join customer_orders co on c.id = co.customer_id
"""

FILES = {
    "dbt_project.yml": "name: jaffle_shop\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/raw_customers.csv": RAW_CUSTOMERS,
    "seeds/raw_orders.csv": RAW_ORDERS,
    "seeds/raw_payments.csv": RAW_PAYMENTS,
    "models/staging/stg_customers.sql": "select * from {{ ref('raw_customers') }}",
    "models/staging/stg_orders.sql": (
        "select id, user_id, order_date, status from {{ ref('raw_orders') }}"
    ),
    "models/staging/stg_payments.sql": "select * from {{ ref('raw_payments') }}",
    "models/marts/orders.sql": ORDERS_SQL,
    "models/marts/customers.sql": CUSTOMERS_SQL,
    "models/schema.yml": """
version: 2
models:
  - name: orders
    columns:
      - name: order_id
        data_tests: [unique, not_null]
      - name: status
        data_tests:
          - accepted_values:
              values: [placed, shipped, completed, return_pending, returned]
  - name: customers
    columns:
      - name: customer_id
        data_tests: [unique, not_null]
""",
}


def test_jaffle_shop_flow(make_project, spark):
    runner = make_project(FILES, schema="t_jaffle")
    assert runner.seed().ok
    res = runner.build()
    assert res.ok, [r.message for r in res.results if r.status == "error"]

    orders = {r["order_id"]: r for r in spark.table("t_jaffle.orders").collect()}
    assert orders[1]["credit_card_amount"] == 1000
    assert orders[1]["coupon_amount"] == 100
    assert orders[1]["amount"] == 1100
    assert orders[4]["gift_card_amount"] == 300

    cust = {
        r["customer_id"]: r for r in spark.table("t_jaffle.customers").collect()
    }
    assert cust[1]["number_of_orders"] == 2
    assert cust[1]["customer_lifetime_value"] == 1600
    assert str(cust[1]["first_order"])[:10] == "2018-01-01"
    assert cust[3]["number_of_orders"] == 1

    # all tests in the build passed
    test_results = [r for r in res.results if r.unique_id.startswith("test.")]
    assert len(test_results) == 5
    assert all(r.status == "pass" for r in test_results)
