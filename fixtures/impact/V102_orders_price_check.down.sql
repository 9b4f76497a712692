ALTER TABLE orders DROP CONSTRAINT orders_price_chk;
