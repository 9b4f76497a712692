ALTER TABLE customer ALTER COLUMN c_acctbal TYPE numeric(18,4);
