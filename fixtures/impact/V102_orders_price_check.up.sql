ALTER TABLE orders ADD CONSTRAINT orders_price_chk CHECK (o_totalprice < 400000);
