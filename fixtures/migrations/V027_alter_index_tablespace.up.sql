ALTER INDEX idx_users_email SET TABLESPACE fastspace;
